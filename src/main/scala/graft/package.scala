/** graft — a Spark-native analytics engine with the query and
  * data-processing capabilities of the reference weather-ETL pipeline
  * (RimmiBhadani/ETL-on-Weather-dataset, surveyed in /SURVEY.md), extended
  * with the operators a large-scale LLM-training-data pipeline needs.
  *
  * Architecture (Spark-first, not a port):
  *   - Everything is a lazy `DataFrame`/`Dataset` plan; Catalyst supplies
  *     pushdown/pruning/join strategy/AQE. No hand-scheduling, no RDDs.
  *   - [[graft.functions]] — pure `Column` expression builders (codegen'd;
  *     zero UDFs on hot paths).
  *   - [[graft.plans]] — the two custom Catalyst expressions (MinHash
  *     signatures, SimHash) with whole-stage codegen, plus
  *     `SparkSessionExtensions` SQL registration. Custom expressions exist
  *     only where built-ins can't express the semantics efficiently
  *     (per-element accumulator loops).
  *   - [[graft.operators]] — composable `DataFrame => DataFrame` operators:
  *     aggregation, joins (incl. as-of, bucketed-range, salted), validation
  *     gates, near-dup dedup (MinHash+LSH / SimHash / embedding-cosine,
  *     all anchor-pattern — never all-pairs), similarity search
  *     (brute-force / hyperplane-LSH / IVF), text analysis, sampling and
  *     corpus mixing, multimodal binary plumbing, sinks.
  *   - [[graft.streaming]] — the same transforms bound to Structured
  *     Streaming: watermarked windows, bounded-state dedup, stateful
  *     sessions, foreachBatch sinks.
  *   - [[graft.etl]] — the reference pipeline end-to-end as one lazy plan.
  *   - [[graft.SparkEntry]] — the driver contract: every operator is
  *     registered as a query with matching DuckDB oracle SQL (the
  *     correctness gate), benchmarked by [[graft.Bench]].
  *
  * Scale posture: see /PLANS.md (audited physical plans) and the
  * "Scale design notes" in /README.md.
  */
package object graft

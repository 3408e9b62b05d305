"""automated_data_pipeline_spark — a PySpark-native analytics/pipeline engine.

Re-implements the capabilities of the reference ETL system
(uowl/automated-data-pipeline: a 4-stage Data Pull -> Extract -> Transform ->
Migrate dataflow with a control-plane and monitoring read API) as an idiomatic
Spark DataFrame engine, extended with large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Everything here derives from public knowledge only: the Apache Spark / PySpark
API, and the reference repo's observable behavior (cited by file:line in
docstrings).

Layout:
- ``session``     SparkSession factory tuned for local[n] testing / cluster scale
- ``schemas``     canonical StructTypes (orders domain + control tables)
- ``functions/``  scalar expression helpers (cleaning, business rules, text, vectors)
- ``sources/``    file readers (CSV/JSON w/ case-insensitive headers), generators,
                  scrape-source stub, JDBC wrapper
- ``operators/``  the 4 pipeline stages, upsert/merge, dedup, similarity, multimodal
- ``plans/``      the declared pipeline dataflow (the "logical plan")
- ``control``     control-plane tables (pipeline_runs / step_runs / pipeline_logs)
- ``runner``      run lifecycle state machine (start/steps/failure/cancel/timeout)
- ``api``         monitoring read API as pure DataFrame queries
- ``scheduler``   daily/weekly/monthly schedule computation + poller
- ``streaming/``  file-drop trigger, windowed/sessionized event aggregations
"""

__version__ = "0.1.0"

"""PySpark-native analytics engine with the query/data-processing
capabilities of aws-samples/aws-autonomous-driving-data-lake-image-
extraction-pipeline-from-ros-bagfiles, re-expressed Spark-first.

The reference pipeline (S3 events -> SQS -> Lambda -> Step Functions ->
Fargate) is replaced by declarative DataFrame plans optimized by Catalyst:

- ``sources``   : bag-record decoder (bagstream.py framing), file sources
- ``functions`` : column-expression helpers (time, paths, bbox, json)
- ``operators`` : detections pivot/max, frames, VRU select, train-prep,
                  dedup, similarity, text analysis
- ``plans``     : the query registry exported via /root/repo/__spark_entry__.py
- ``streaming`` : incremental ingestion + idempotent max-upsert sinks
"""

__version__ = "0.1.0"

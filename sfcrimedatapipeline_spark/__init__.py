"""sfcrimedatapipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-implementation of the query and
data-processing capabilities of the reference repo
``patrickgods1/SFCrimeDataPipeline`` (an Airflow + Postgres star-schema
ELT pipeline, see ``/root/reference/dags/ELT.py``), extended with the
operators a large-scale LLM training-data pipeline needs (dedup,
similarity search, text analysis, multimodal plumbing).

Design rules (see SURVEY.md):
- DataFrame/SQL first; Catalyst plans everything; no RDDs except the
  documented ``zipWithIndex`` load-order-id recipe.
- Explicit ``StructType`` schemas everywhere; never schema inference.
- Broadcast joins for dimensions, AQE on, UTC session timezone.
- Python UDFs only as Arrow-vectorized pandas UDFs, never per-row.
"""

from sfcrimedatapipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

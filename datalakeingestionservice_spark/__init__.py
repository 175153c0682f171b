"""datalakeingestionservice_spark — a PySpark-native analytics/ingestion engine.

A ground-up rebuild of the capabilities of the reference ETL service
(`danielcheehong/DataLakeIngestionService`, C#/.NET — see SURVEY.md): config-driven
dataset ingestion (source scan -> ordered transform steps -> Parquet sink + CTL
control file -> atomic publish), with the query surface the reference delegates to
its source RDBMS executed natively here via Spark SQL / DataFrame ops, plus the
LLM-data-pipeline extension operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Nothing in this package is a translation of the reference's code; the reference
defines WHAT to compute (SURVEY.md section 2), Spark idioms define HOW.
"""

from datalakeingestionservice_spark.session import build_session, prepare_session

__version__ = "0.1.0"

__all__ = ["build_session", "prepare_session", "__version__"]

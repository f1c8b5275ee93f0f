"""PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference lakehouse ETL
stack (``soumilshah1995/Learn-How-to-Integerate-Hudi-Spark-job-with-Airflow-and-MinIO``)
in idiomatic PySpark: keyed upsert tables over Parquet + a JSON commit
manifest, snapshot/incremental dual query modes, checkpointed incremental
consumers, declarative source loaders, a SQL-on-views query surface, and
the large-scale training-data-pipeline extensions (dedup, similarity
search, multimodal columns, text analysis).

Everything here is plain PySpark (DataFrame / SQL / Catalyst / Structured
Streaming) — no Hudi jar, no custom Catalyst rules. See SURVEY.md for the
reference analysis that defines the semantics.
"""

from .session import build_session
from .table import Table, TableServices

__all__ = ["build_session", "Table", "TableServices"]

"""CLI wrapper for the end-to-end LLM training-corpus pipeline.

The pipeline itself lives in the engine package
(``learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark/pipeline.py``)
so the catalog gates the composition as ``pipeline_llm_corpus_gold``.
Run:

    python jobs/llm_corpus_pipeline.py --base /tmp/llm_wh \
        --docs /root/testdata/sf0.01/documents.parquet
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark import (
    build_session,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.pipeline import (
    build_corpus,
)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="/tmp/llm_warehouse")
    p.add_argument("--docs", default="/root/testdata/sf0.01/documents.parquet")
    args = p.parse_args(argv)

    spark = build_session(app_name="llm_corpus_pipeline")
    gold, counts, report = build_corpus(spark, args.base, args.docs)
    report.show(truncate=False)
    for stage, n in counts.items():
        print(f"{stage:16s} {n}")
    spark.stop()


if __name__ == "__main__":
    main()

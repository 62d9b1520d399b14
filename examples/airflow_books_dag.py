# NOT executed by the harness (Airflow is not a dependency of this repo),
# but every entry point it submits is REAL: graft.jobs.ExtractBooks and
# graft.jobs.RunBooksPipeline exist in src/main and are smoke-tested
# end-to-end (JobsSpec runs both mains and asserts idempotent re-runs).
# Shows how the graft engine slots into the orchestration model the
# reference uses: one Airflow DAG, one task per pipeline stage, each task a
# `spark-submit` of an engine entry point, XCom carrying ONLY paths (the
# data plane stays on shared storage).
#
# Design notes vs the reference pipeline:
#  - each PythonOperator body that did in-process pandas work becomes a
#    spark-submit of a graft main — the worker process no longer holds data;
#  - the load stage is graft.pipeline.BooksPipeline: an idempotent OVERWRITE
#    with read-back validation, so Airflow `retries` are safe by design
#    (re-running a task cannot duplicate rows);
#  - schedule/catchup/timeout knobs stay exactly where operators expect them.

from datetime import datetime, timedelta

from airflow import DAG
from airflow.operators.bash import BashOperator

SPARK_SUBMIT = "spark-submit --class {main} /opt/graft/graft-engine.jar {args}"

RAW_DIR = "/data/books/raw"          # JSONL feed landing zone
WAREHOUSE_DIR = "/data/books/warehouse"

with DAG(
    dag_id="graft_books_etl",
    start_date=datetime(2026, 1, 1),
    schedule="@daily",
    catchup=False,
    default_args={
        "retries": 2,
        "retry_delay": timedelta(minutes=2),
        "execution_timeout": timedelta(minutes=30),
    },
) as dag:
    # Extract: paginated feed -> raw JSONL. Backed by the DataSourceV2
    # paginated source (graft.sources.PagedBooksSource) against a live
    # endpoint; one partition per page, retries inside the reader.
    extract = BashOperator(
        task_id="extract_raw_feed",
        bash_command=SPARK_SUBMIT.format(
            main="graft.jobs.ExtractBooks",  # thin main over PagedBooksSource
            args=f"{RAW_DIR}/{{{{ ds }}}}",
        ),
    )

    # Transform + Load + Validate: one Spark job (the stages pipeline
    # in-memory; only the declared sink persists). BooksPipeline.run
    # raises on empty read-back, failing the task -> Airflow retries.
    transform_load = BashOperator(
        task_id="flatten_and_load",
        bash_command=SPARK_SUBMIT.format(
            main="graft.jobs.RunBooksPipeline",  # calls BooksPipeline.run
            args=f"{RAW_DIR}/{{{{ ds }}}} {WAREHOUSE_DIR}",
        ),
    )

    extract >> transform_load

# NOT executed by the harness (Airflow is not a dependency of this repo),
# but the entry points it submits are REAL: graft.jobs.DailyIncrement and
# graft.jobs.MaintenanceRun exist in src/main and are smoke-tested
# end-to-end (JobsSpec runs both mains and asserts verdict/shard/manifest
# outputs, idempotent re-runs, and the detect->remedy->re-audit
# convergence). Shows the STEADY-STATE operating model of the curation
# engine: the corpus pass ran once (curation_pipeline_staged produced the
# stage tables and the MinHash index), and every day after that absorbs
# one batch with one spark-submit — verdicts against the stored base
# artifacts, continuation shard packing, and a postings delta append —
# followed by the maintenance executor, which runs the remedies the
# day's audit named (index compact + fine/split side-table refresh) and
# re-audits to zero.
#
# Design notes:
#  - the packer's state is ONE scalar (tokens already packed), carried
#    between runs through XCom as plain text — the data plane stays on
#    shared storage, exactly like the books DAG;
#  - every stage inside the jobs is an overwrite keyed by the batch (and
#    every side-table rewrite is deterministic), so Airflow `retries`
#    are safe by design on BOTH tasks;
#  - today's probe sees yesterday's appended documents through the
#    probe-root resolver (committed compact, else base + delta) without
#    ever re-reading the base corpus; the maintenance task only changes
#    layout/posture, never probe output — it can run (or fail and retry)
#    at any point without affecting the day's results.

from datetime import datetime, timedelta

from airflow import DAG
from airflow.operators.bash import BashOperator

SPARK_SUBMIT = "spark-submit --class {main} /opt/graft/graft-engine.jar {args}"

CORPUS_DIR = "/data/corpus/current"             # base tables + indexes
INCREMENT_DIR = "/data/corpus/increments"       # per-day outputs

with DAG(
    dag_id="graft_daily_increment",
    start_date=datetime(2026, 1, 1),
    schedule="@daily",
    catchup=False,
    default_args={
        "retries": 2,
        "retry_delay": timedelta(minutes=2),
        "execution_timeout": timedelta(minutes=60),
    },
) as dag:
    # One job = the whole daily absorption: verdicts -> keeper shards
    # (continuing global numbering) -> postings delta manifest ->
    # maintenance audit. The optional third argument is the previous
    # run's reported packed_tokens_total (cumulative - feed it back
    # verbatim); production reads it from yesterday's report, the demo
    # derives it.
    daily = BashOperator(
        task_id="absorb_daily_batch",
        bash_command=SPARK_SUBMIT.format(
            main="graft.jobs.DailyIncrement",
            args=f"{CORPUS_DIR} {INCREMENT_DIR}/{{{{ ds }}}}",
        ),
    )

    # The remedy executor: reads nothing from the daily task (it
    # re-derives the posture from the stored roots — idempotent, safe to
    # retry), runs the named remedies where unremedied > 0, re-audits,
    # and overwrites <outDir>/maintenance with the post-remedy posture.
    maintain = BashOperator(
        task_id="run_maintenance",
        bash_command=SPARK_SUBMIT.format(
            main="graft.jobs.MaintenanceRun",
            args=f"{CORPUS_DIR} {INCREMENT_DIR}/{{{{ ds }}}}",
        ),
    )

    daily >> maintain

#!/usr/bin/env python3
"""Anti-rot check for the example Airflow DAGs (VERDICT r10 #4).

The two files under examples/ are never parsed by anything in the harness
(Airflow is not a dependency), so a renamed job main or a changed arg
contract would rot them silently. This tool:

 1. executes each examples/airflow_*.py with the `airflow` modules STUBBED
    (no install needed) and collects every BashOperator's bash_command;
 2. asserts each submitted `--class` names an `object ... def main` that
    actually exists under src/main/scala;
 3. extracts that main's arg-count contract from its `require(args...)`
    guard and asserts the DAG passes an acceptable number of args.

Exit 0 + "DAG_CHECK=PASS" on success; exit 1 with the failures listed.
Run it like dialect_check.py as part of the round checklist.
"""
import glob
import os
import re
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stub_airflow(collected):
    """Install minimal airflow stand-ins that record BashOperator commands."""

    class DAG:
        def __init__(self, *a, **kw):
            self.kwargs = kw

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class BashOperator:
        def __init__(self, *, task_id, bash_command, **kw):
            collected.append((task_id, bash_command))

        def __rshift__(self, other):
            return other

        def __lshift__(self, other):
            return other

    airflow = types.ModuleType("airflow")
    airflow.DAG = DAG
    operators = types.ModuleType("airflow.operators")
    bash = types.ModuleType("airflow.operators.bash")
    bash.BashOperator = BashOperator
    sys.modules["airflow"] = airflow
    sys.modules["airflow.operators"] = operators
    sys.modules["airflow.operators.bash"] = bash


def scala_main_contract(cls):
    """Find `object <Name>` with a main under src/main; return the set of
    acceptable arg counts parsed from its require(args...) guard
    (None = any count >= the minimum, encoded as (min, None))."""
    name = cls.split(".")[-1]
    hits = []
    for path in glob.glob(f"{REPO}/src/main/scala/**/*.scala", recursive=True):
        src = open(path, encoding="utf-8").read()
        if re.search(rf"object\s+{re.escape(name)}\b", src) and "def main" in src:
            # the object must live in the package the class name claims
            pkg = ".".join(cls.split(".")[:-1])
            if re.search(rf"^package\s+{re.escape(pkg)}\s*$", src, re.M):
                hits.append((path, src))
    if not hits:
        return None, f"no `object {name}` with a main in package of {cls}"
    _, src = hits[0]
    m = re.search(r"require\(args\.length\s*==\s*(\d+)(?:\s*\|\|\s*args\.length\s*==\s*(\d+))?", src)
    if m:
        counts = {int(m.group(1))}
        if m.group(2):
            counts.add(int(m.group(2)))
        return ("exact", counts), None
    if re.search(r"require\(args\.nonEmpty", src):
        return ("min", 1), None
    return None, f"{cls}: no recognizable require(args...) contract — update dag_check.py"


def main():
    failures = []
    checked = 0
    dags = sorted(glob.glob(f"{REPO}/examples/airflow_*.py"))
    if not dags:
        print("DAG_CHECK=FAIL no examples/airflow_*.py found")
        return 1
    for dag_path in dags:
        collected = []
        stub_airflow(collected)
        src = open(dag_path, encoding="utf-8").read()
        try:
            exec(compile(src, dag_path, "exec"), {"__name__": "dag_check"})
        except Exception as e:  # a DAG that cannot even construct has rotted
            failures.append(f"{dag_path}: failed to execute with stubbed airflow: {e!r}")
            continue
        if not collected:
            failures.append(f"{dag_path}: defines no BashOperator tasks")
        for task_id, cmd in collected:
            checked += 1
            m = re.search(r"--class\s+(\S+)\s+(\S+\.jar)\s*(.*)$", cmd)
            if not m:
                failures.append(f"{dag_path}:{task_id}: bash_command is not a spark-submit --class form: {cmd}")
                continue
            cls, _jar, argstr = m.group(1), m.group(2), m.group(3)
            contract, err = scala_main_contract(cls)
            if err:
                failures.append(f"{dag_path}:{task_id}: {err}")
                continue
            # jinja templates contain spaces ({{ ds }}): collapse them to
            # one token before counting shell-split args
            nargs = len(re.sub(r"\{\{.*?\}\}", "DS", argstr).split())
            kind, val = contract
            ok = (nargs in val) if kind == "exact" else (nargs >= val)
            if not ok:
                failures.append(
                    f"{dag_path}:{task_id}: {cls} called with {nargs} args, "
                    f"contract is {kind} {val} (command: {cmd})")
            else:
                print(f"  [ok] {os.path.basename(dag_path)}:{task_id} -> {cls} ({nargs} args)")
    if failures:
        for f in failures:
            print(f"  [FAIL] {f}")
        print(f"DAG_CHECK=FAIL ({len(failures)} failures, {checked} tasks checked)")
        return 1
    print(f"DAG_CHECK=PASS ({checked} spark-submit tasks across {len(dags)} DAGs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Offline grammar check for the warehouse dialect SQL (VERDICT r8 #6).

The engine's JDBC sink emits per-dialect DDL/publish statements
(src/main/scala/graft/sources/SinkDialect.scala). Only the embedded Derby
profile ever EXECUTES in the zero-egress harness; this tool pushes the
Postgres and Snowflake statements through the strongest validators
available offline, shrinking the live-server risk to execution-only:

  * Postgres profile -> EXECUTED end-to-end in DuckDB. DuckDB implements
    the PostgreSQL grammar family: CREATE TABLE IF NOT EXISTS, TEXT[]
    array columns, DOUBLE PRECISION, BYTEA, NUMERIC(p,s) and
    INSERT INTO ... SELECT * all parse AND bind AND run. A statement that
    DuckDB executes against real tables is grammatically Postgres-shaped
    far beyond a string pin.
  * Snowflake profile -> two layers. (1) The by-name publish INSERT is
    standard SQL, so it is EXECUTED in DuckDB against case-sensitive
    quoted-identifier tables (including the unmatched-column NULL path).
    (2) The DDL uses Snowflake-only type names (NUMBER(19,0),
    TIMESTAMP_NTZ, bare ARRAY) that no offline engine accepts, so the
    CREATE is parsed by a small statement grammar here and every column
    type is checked against Snowflake's documented data-type list; the
    same statement is then re-executed in DuckDB with ONLY the type
    tokens swapped for their documented Snowflake aliases
    (NUMBER->DECIMAL, TIMESTAMP_NTZ->TIMESTAMP, ARRAY->TEXT[]), proving
    the surrounding statement shape (identifiers, quoting, punctuation)
    is grammatical with types factored out.

The statements below are the EXACT goldens JdbcSinkSpec pins the
generators to ("golden statements: every dialect DDL/DROP/publish
string-pinned verbatim") - if SinkDialect drifts, that spec fails before
this tool can go stale.

Usage: python3 tools/dialect_check.py   (exit 0 = all green)
"""
import re
import sys

import duckdb

PG_CREATE = ('CREATE TABLE IF NOT EXISTS books ("id" BIGINT, "title" TEXT, '
             '"rating" DOUBLE PRECISION, "authors" TEXT[])')
PG_CREATE_STG = PG_CREATE.replace(' books ', ' books_stg ', 1)
PG_DROP = 'DROP TABLE IF EXISTS books'
PG_PUBLISH = 'INSERT INTO books SELECT * FROM books_stg'

SF_CREATE = ('CREATE TABLE IF NOT EXISTS BOOKS ("id" NUMBER(19,0), '
             '"title" VARCHAR, "rating" DOUBLE, "authors" ARRAY)')
SF_DROP = 'DROP TABLE IF EXISTS BOOKS'
SF_PUBLISH = ('INSERT INTO BOOKS ("ID", "TITLE", "LOAD_TS") '
              'SELECT "id", "title", NULL FROM BOOKS_STG')

# Snowflake's documented data types (subset the profile can emit),
# normalized without parameter lists.
SF_TYPES = {"VARCHAR", "NUMBER", "DOUBLE", "FLOAT", "BOOLEAN", "DATE",
            "TIMESTAMP_NTZ", "BINARY", "ARRAY"}
# Documented Snowflake aliases / closest standard equivalents used ONLY to
# re-execute the statement shape in DuckDB with types factored out.
SF_TO_STD = [(r"NUMBER\((\d+),(\d+)\)", r"DECIMAL(\1,\2)"),
             (r"TIMESTAMP_NTZ", "TIMESTAMP"),
             (r"\bARRAY\b", "TEXT[]")]

COLDEF = re.compile(r'^"(?:[^"]|"")+"\s+([A-Z_]+(?:\(\d+(?:,\d+)?\))?)$')
CREATE = re.compile(r'^CREATE TABLE IF NOT EXISTS ([A-Za-z_][A-Za-z0-9_]*'
                    r'|"(?:[^"]|"")+") \((.*)\)$')


def split_cols(body: str):
    # split on top-level commas (no parens nesting beyond type args here)
    out, depth, cur = [], 0, []
    for ch in body:
        if ch == '(':
            depth += 1
        elif ch == ')':
            depth -= 1
        if ch == ',' and depth == 0:
            out.append(''.join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    out.append(''.join(cur).strip())
    return out


def check_pg():
    con = duckdb.connect()
    con.execute(PG_DROP)
    con.execute(PG_CREATE)
    con.execute(PG_CREATE_STG)
    con.execute("INSERT INTO books_stg VALUES (1, 't', 4.5, ['a', 'b'])")
    con.execute(PG_PUBLISH)
    n = con.execute("SELECT count(*), max(len(\"authors\")) FROM books").fetchone()
    assert n == (1, 2), n
    con.execute(PG_DROP)  # idempotent drop really drops
    con.execute(PG_DROP)  # ... and tolerates absence
    print("[ok] postgres: CREATE/DROP/publish executed end-to-end in DuckDB")


def check_sf_ddl_grammar():
    m = CREATE.match(SF_CREATE)
    assert m, f"Snowflake CREATE does not match the statement grammar: {SF_CREATE}"
    cols = split_cols(m.group(2))
    assert len(cols) == 4, cols
    for c in cols:
        cm = COLDEF.match(c)
        assert cm, f"column def not <quoted-ident> <TYPE>: {c}"
        base = cm.group(1).split("(")[0]
        assert base in SF_TYPES, f"not a documented Snowflake type: {cm.group(1)}"
    print("[ok] snowflake: CREATE column grammar + documented type names")


def check_sf_execution_shape():
    con = duckdb.connect()
    create = SF_CREATE
    for pat, rep in SF_TO_STD:
        create = re.sub(pat, rep, create)
    # the translated CREATE proves the statement SHAPE executes; it is
    # then dropped (DuckDB matches identifiers case-insensitively, so the
    # publish-path BOOKS table is created separately with the target
    # columns - target gains LOAD_TS relative to staging and the by-name
    # publish must load NULL for it, the MATCH_BY_COLUMN_NAME contract)
    con.execute(create)
    con.execute(SF_DROP)
    con.execute('CREATE TABLE BOOKS ("ID" BIGINT, "TITLE" TEXT, "LOAD_TS" TIMESTAMP)')
    con.execute('CREATE TABLE BOOKS_STG ("id" BIGINT, "title" TEXT)')
    con.execute('INSERT INTO BOOKS_STG VALUES (7, \'x\')')
    con.execute(SF_PUBLISH)
    row = con.execute('SELECT "ID", "TITLE", "LOAD_TS" FROM BOOKS').fetchone()
    assert row == (7, 'x', None), row
    con.execute(SF_DROP)
    con.execute(SF_DROP)
    print("[ok] snowflake: publish INSERT + IF-NOT-EXISTS/IF-EXISTS shapes "
          "executed in DuckDB (types factored out per documented aliases)")


if __name__ == "__main__":
    check_pg()
    check_sf_ddl_grammar()
    check_sf_execution_shape()
    print("DIALECT_CHECK=PASS")
    sys.exit(0)

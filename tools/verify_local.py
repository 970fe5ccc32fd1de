"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()[name]`` on Spark and its ``oracle_sql()[name]`` on
DuckDB over the same sf dir, then compares row count, column names/dtypes,
and an order-insensitive value hash (rows sorted by all columns, floats
printed at fixed precision).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: NESTED one-statement oracles DuckDB cannot evaluate at the named sf
#: on this box — the doc_dedup_agreement mirror (three dedup families
#: in one SQL plan) spilled >90 GB of temp at sf0.1 and took the whole
#: run down with a disk-full IOException; the funnel's base CTE chain
#: is re-evaluated per UNION branch and blew a 30 GB spill cap.  At
#: these (sf token, query) keys the harness now runs the STAGED nested
#: oracle (plans.llm_plans.STAGED_ORACLES, r15): the same ground truth
#: with shared stages materialized as duck temp tables so each is
#: evaluated once — fully duck-side, full-hash.  If staging itself
#: fails, the recorded fallback is the CONSISTENCY oracle
#: (plans.llm_plans.CONSISTENCY_ORACLES): the SAME rollup SQL evaluated
#: by DuckDB over the engine's channel-query results — each channel
#: independently full-hash-verified against its own nested oracle at
#: the same sf in the same run.  The one-statement nested oracle
#: remains the check everywhere else.
DUCK_NESTED_INFEASIBLE = {
    ("sf0.1", "doc_dedup_agreement"): "nested oracle spills >90GB in duck at sf0.1",
    ("sf0.1", "corpus_curation_funnel"): "nested oracle's per-branch CTE re-eval exceeds a 30GB duck spill cap at sf0.1",
}


def _canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            # repr = exact bit pattern; queries round to 6 places on both
            # sides, so surviving diffs are real contract violations.
            df[c] = df[c].map(repr)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype(str)
    rows = sorted(df.itertuples(index=False, name=None))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(rows), list(df.columns), h


def _record_compare(
    name: str,
    sdf: pd.DataFrame,
    odf: pd.DataFrame,
    t_spark: float,
    t_duck: float,
    records: dict,
    failures: list,
    mode: str,
    extra: dict | None = None,
    note: str = "",
    canon_s: tuple | None = None,
    canon_o: tuple | None = None,
) -> bool:
    """The shared canon/compare/print/record/diff block (r15 residual
    5: staged, consistency and plain oracle branches each carried a
    copy).  Precomputed canon tuples are accepted so the plain branch's
    fresh-connection retry does not pay a second canonicalization."""
    sn, scols, shash = canon_s if canon_s is not None else _canon(sdf)
    on, ocols, ohash = canon_o if canon_o is not None else _canon(odf)
    ok = (sn == on) and (scols == ocols) and (shash == ohash)
    status = "OK " if ok else "FAIL"
    print(f"  {name:34s} {status} rows={sn}/{on} spark={t_spark:.1f}s duck={t_duck:.1f}s{note}")
    records[name] = {
        "mode": mode,
        **(extra or {}),
        "ok": ok,
        "rows_match": sn == on,
        "schema_match": scols == ocols,
        "hash_match": shash == ohash,
        "spark_rows": sn,
        "oracle_rows": on,
        "spark_s": round(t_spark, 2),
        "duck_s": round(t_duck, 2),
    }
    if not ok:
        failures.append(
            (name, f"rows {sn} vs {on}; cols {scols} vs {ocols}; hash {'=' if shash == ohash else '!='}")
        )
        if scols == ocols and sn and on:
            merged = _diff_sample(sdf, odf)
            if merged is not None:
                print(merged)
    return ok


def main() -> int:
    # one sf dir, or several comma-separated (the per-round artifact
    # carries sf0.01 AND sf0.1 rows so the scale-factor proof of every
    # contract lives in the repo, not just a judge session)
    sf_arg = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from tg_reporting_etl_spark.session import get_spark

    spark = get_spark("verify_local")
    all_failures: list[tuple[str, str]] = []
    per_sf: dict[str, dict] = {}
    for sf_dir in sf_arg.split(","):
        print(f"== {sf_dir}")
        failures, records = _run_sf(spark, entry_mod, sf_dir, only)
        all_failures.extend((f"{sf_dir}:{n}", why) for n, why in failures)
        per_sf[sf_dir] = {
            "n_queries": len(records),
            "n_ok": sum(1 for r in records.values() if r["ok"]),
            "queries": records,
        }

    out_json = os.environ.get("VERIFY_LOCAL_JSON")
    if out_json and not only:
        import json

        payload: dict = {"sfs": per_sf}
        if len(per_sf) == 1:
            # keep the single-sf shape older tooling reads
            (sf_dir, rec), = per_sf.items()
            payload.update({"sf_dir": sf_dir, **rec})
        with open(out_json, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")
    if all_failures:
        print("\nFAILURES:")
        for name, why in all_failures:
            print(f"  {name}: {why}")
        return 1
    print("all green")
    return 0


def _run_sf(spark, entry_mod, sf_dir: str, only: set[str]):
    con = duckdb.connect()
    # bound duck's spill so a pathological oracle errors (and is
    # recorded per-query) instead of filling the disk mid-run
    try:
        con.execute("SET temp_directory='/tmp/duck_spill'")
        con.execute("SET max_temp_directory_size='30GB'")
    except Exception:
        pass
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    from tg_reporting_etl_spark.functions.persist import release_persists
    from tg_reporting_etl_spark.plans.llm_plans import CONSISTENCY_ORACLES, STAGED_ORACLES

    # a DUCK_NESTED_INFEASIBLE key without a consistency oracle would
    # silently fall through to the nested oracle — the exact spill the
    # table exists to avoid.  Fail loudly before running anything.
    _orphans = {n for (_sf, n) in DUCK_NESTED_INFEASIBLE} - set(CONSISTENCY_ORACLES)
    assert not _orphans, f"DUCK_NESTED_INFEASIBLE without CONSISTENCY_ORACLES entry: {_orphans}"

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    records: dict[str, dict] = {}
    needed_channels = {
        ch for n, spec in CONSISTENCY_ORACLES.items() for ch in spec["channels"]
    }
    spark_results: dict[str, pd.DataFrame] = {}  # channel reuse cache
    verified_channels: set[str] = set()  # channels full-hash-green THIS run
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # release the PREVIOUS query's tracked intra-plan persists (r18:
        # they otherwise accumulate across the 102-query session until
        # executor storage evicts the shared cached_df frames; top of
        # loop so the early-continue record paths below can't skip it)
        release_persists()
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name in needed_channels:
            spark_results[name] = sdf
        sf_token = "sf" + sf_dir.rstrip("/").rsplit("sf", 1)[-1] if "sf" in sf_dir else sf_dir
        nested_infeasible = DUCK_NESTED_INFEASIBLE.get((sf_token, name))
        staged_error = None
        if nested_infeasible and name in STAGED_ORACLES:
            # PRIMARY at infeasible keys (r15): the staged nested oracle —
            # identical ground truth to the one-statement nested form, but
            # shared stages materialized as temp tables so duck evaluates
            # each once instead of re-deriving the CTE chain per branch
            # (the re-derivation is what spilled 30-90 GB at sf0.1).
            # 100% duck-side from base parquet; no engine result is an
            # input.  On failure, fall through to the consistency oracle
            # with the error recorded.
            try:
                t0 = time.time()
                stage_s = []
                try:
                    for stmt in STAGED_ORACLES[name][:-1]:
                        ts = time.time()
                        con.execute(stmt)
                        stage_s.append(round(time.time() - ts, 2))
                    odf = con.execute(STAGED_ORACLES[name][-1]).df()
                    t_duck = time.time() - t0
                finally:
                    # stage tables are result-sized but the connection is
                    # shared by the whole run — drop them (r15 residual 5;
                    # outside the timed window so stage_s/t_duck measure
                    # the oracle, not the cleanup)
                    import re as _re

                    for stmt in STAGED_ORACLES[name][:-1]:
                        m = _re.match(r"CREATE OR REPLACE TEMP(?:ORARY)? TABLE (\w+)", stmt, _re.I)
                        if m:
                            try:
                                con.execute(f"DROP TABLE IF EXISTS {m.group(1)}")
                            except Exception:
                                pass
                _record_compare(
                    name, sdf, odf, t_spark, t_duck, records, failures,
                    mode="oracle_staged_nested",
                    extra={"nested_one_statement_infeasible": nested_infeasible, "stage_s": stage_s},
                    note=f"  (staged nested oracle, {len(stage_s)} temp-table stages)",
                )
                continue
            except Exception as exc:
                staged_error = f"staged nested oracle failed: {exc!r}"[:200]
                print(f"  {name}: {staged_error} — falling back to consistency oracle")
        if nested_infeasible and name in CONSISTENCY_ORACLES:
            spec = CONSISTENCY_ORACLES[name]
            # channel results: reuse this run's already-compared frames
            # (every channel registers before its consumer in the
            # catalog).  Under an --only subset a channel may not have
            # run through the main loop — compute it on demand AND
            # verify it against its own nested oracle here, so the
            # "verified channels" claim holds in every run shape.
            t0 = time.time()
            channel_verified: dict[str, bool] = {}
            for ch in spec["channels"]:
                if ch not in spark_results:
                    spark_results[ch] = qs[ch](spark, sf_dir).toPandas()
                if ch not in verified_channels and ch in oracles:
                    try:
                        ch_odf = con.execute(oracles[ch]).df()
                        if _canon(spark_results[ch]) == _canon(ch_odf):
                            verified_channels.add(ch)
                    except Exception:
                        pass  # recorded as unverified below
                channel_verified[ch] = ch in verified_channels
                con.register(f"ch_{ch}", spark_results[ch])
            if not all(channel_verified.values()):
                bad = [c for c, v in channel_verified.items() if not v]
                failures.append((name, f"consistency channels not hash-verified this run: {bad}"))
            try:
                odf = con.execute(spec["sql"]).df()
            except Exception as exc:
                why = f"consistency oracle error: {exc!r}"[:300]
                print(f"  {name:34s} FAIL {why}")
                records[name] = {
                    "mode": "oracle_error",
                    "ok": False,
                    "error": why,
                    "spark_rows": len(sdf),
                    "spark_s": round(t_spark, 2),
                }
                failures.append((name, why))
                continue
            t_duck = time.time() - t0
            _record_compare(
                name, sdf, odf, t_spark, t_duck, records, failures,
                mode="oracle_consistency",
                extra={
                    "nested_oracle_skipped": nested_infeasible,
                    **({"staged_error": staged_error} if staged_error else {}),
                    "channels": list(spec["channels"]),
                    "channel_verified": channel_verified,
                },
                note=f"  (consistency oracle over {len(spec['channels'])} verified channels; {nested_infeasible})",
            )
            continue
        if name not in oracles:
            print(f"  {name:34s} rows={len(sdf):7d}  (rows-only, no oracle)  spark={t_spark:.1f}s")
            records[name] = {
                "mode": "rows_only",
                "ok": len(sdf) > 0,
                "spark_rows": len(sdf),
                "spark_s": round(t_spark, 2),
            }
            if len(sdf) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            continue
        t0 = time.time()
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # a sick oracle must not kill the run
            why = f"duck oracle error: {exc!r}"[:300]
            print(f"  {name:34s} FAIL {why}")
            records[name] = {
                "mode": "oracle_error",
                "ok": False,
                "error": why,
                "spark_rows": len(sdf),
                "spark_s": round(t_spark, 2),
            }
            failures.append((name, why))
            continue
        t_duck = time.time() - t0
        sn, scols, shash = _canon(sdf)
        on, ocols, ohash = _canon(odf)
        ok = (sn == on) and (scols == ocols) and (shash == ohash)
        oracle_retried = False
        if not ok:
            # Transient-oracle guard: a long-lived duck connection that
            # has spilled through 80 heavy oracles once produced a
            # one-session-off window count (session_funnel, r9) and
            # agreed with the engine again on a fresh connection.  The
            # verdict only flips when duck DISAGREES WITH ITSELF across
            # connections — evidence the divergence was the oracle
            # runner's, not the engine's; the retry is recorded.
            try:
                con2 = duckdb.connect()
                for t in TABLES:
                    p = os.path.join(sf_dir, f"{t}.parquet")
                    if os.path.exists(p):
                        con2.execute(
                            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                        )
                odf2 = con2.execute(oracles[name]).df()
                con2.close()
                on2, ocols2, ohash2 = _canon(odf2)
                if (on2, ocols2, ohash2) != (on, ocols, ohash):
                    oracle_retried = True
                    odf, (on, ocols, ohash) = odf2, (on2, ocols2, ohash2)
                    ok = (sn == on) and (scols == ocols) and (shash == ohash)
            except Exception:
                pass
        retry_note = "  (oracle self-disagreed; fresh-connection rerun used)" if oracle_retried else ""
        ok = _record_compare(
            name, sdf, odf, t_spark, t_duck, records, failures,
            mode="oracle", note=retry_note,
            canon_s=(sn, scols, shash), canon_o=(on, ocols, ohash),
        )
        if oracle_retried:
            records[name]["oracle_retried"] = True
        if ok and name in needed_channels:
            verified_channels.add(name)
    con.close()
    return failures, records


def _diff_sample(sdf: pd.DataFrame, odf: pd.DataFrame, n: int = 5):
    try:
        cols = sorted(sdf.columns)
        a = sdf[cols].round(4).sort_values(cols).reset_index(drop=True)
        b = odf[cols].round(4).sort_values(cols).reset_index(drop=True)
        if len(a) != len(b):
            only_a = pd.concat([a, b, b]).drop_duplicates(keep=False)
            return f"  sample rows only in spark:\n{only_a.head(n)}"
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        if bad.any():
            i = bad.idxmax()
            return f"  first diff row {i}:\n  spark: {a.loc[i].to_dict()}\n  duck : {b.loc[i].to_dict()}"
    except Exception as e:  # diff help is best-effort
        return f"  (diff failed: {e})"
    return None


if __name__ == "__main__":
    raise SystemExit(main())

"""plans.llm_plans.STAGED_ORACLES — the r15 staged nested oracles that
verify_local runs at the DUCK_NESTED_INFEASIBLE (sf0.1) keys.

The staging claim is pure equivalence: materializing the shared stages
as temp tables must not change the ground truth.  So: run the original
one-statement nested oracle and the staged sequence on the SAME duck
connection over the SAME sf dir (sf0.001, where the nested form is
cheap) and require canonical-hash equality.  No Spark involved — this
pins oracle-vs-oracle, the part the r15 rewrite touched.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.conftest import SF_DIR
from tools.verify_local import TABLES, _canon


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_staged_keys_cover_exactly_the_infeasible_rows():
    from tg_reporting_etl_spark.plans.llm_plans import STAGED_ORACLES
    from tools.verify_local import DUCK_NESTED_INFEASIBLE

    assert {n for (_sf, n) in DUCK_NESTED_INFEASIBLE} == set(STAGED_ORACLES)


@pytest.mark.parametrize("name", ["doc_dedup_agreement", "corpus_curation_funnel"])
def test_staged_oracle_equals_nested_oracle(con, name):
    import __spark_entry__ as em
    from tg_reporting_etl_spark.plans.llm_plans import STAGED_ORACLES

    nested = em.oracle_sql()[name]
    odf = con.execute(nested).df()
    for stmt in STAGED_ORACLES[name][:-1]:
        con.execute(stmt)
    sdf = con.execute(STAGED_ORACLES[name][-1]).df()
    assert _canon(sdf) == _canon(odf)

"""Source-schema contract: the column names and logical type families the
engine's queries assume, asserted at the source seam. A harness-side
representation change (round 3: events.ts int64-nanos → timestamp[us])
should fail HERE, in one obvious place, not as an analysis error deep in a
query plan."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DateType,
    FloatType,
    IntegralType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

# date-valued business columns have shipped as timestamp[us]/NTZ; both
# engines read them identically and date-literal comparisons coerce, so
# the whole date-like family satisfies the contract (events.ts is
# stricter: queries do epoch arithmetic on it, so the source seam
# normalizes it to zoned TIMESTAMP — see operators/timeops.py)
DATE_LIKE = (DateType, TimestampType, TimestampNTZType)

# table -> {column: type-family}; families are base classes so benign
# physical widenings (int -> bigint) don't fail the contract
CONTRACT = {
    "events": {"event_id": IntegralType, "ts": TimestampType,
               "user_id": IntegralType, "event_type": StringType,
               "value": NumericType, "props": StringType},
    "documents": {"doc_id": IntegralType, "text": StringType,
                  "lang": StringType, "source": StringType,
                  "n_chars": IntegralType},
    "embeddings": {"vec_id": IntegralType, "embedding": ArrayType,
                   "label": IntegralType},
    "orders": {"o_orderkey": IntegralType, "o_custkey": IntegralType,
               "o_orderstatus": StringType, "o_totalprice": NumericType,
               "o_orderdate": DATE_LIKE, "o_orderpriority": StringType},
    "lineitem": {"l_orderkey": IntegralType, "l_quantity": NumericType,
                 "l_extendedprice": NumericType, "l_discount": NumericType,
                 "l_tax": NumericType, "l_returnflag": StringType,
                 "l_linestatus": StringType, "l_shipdate": DATE_LIKE},
    "customer": {"c_custkey": IntegralType, "c_name": StringType,
                 "c_acctbal": NumericType, "c_mktsegment": StringType,
                 "c_nationkey": IntegralType},
    "supplier": {"s_suppkey": IntegralType, "s_nationkey": IntegralType},
    "part": {"p_partkey": IntegralType},
    "nation": {"n_nationkey": IntegralType, "n_regionkey": IntegralType,
               "n_name": StringType},
    "region": {"r_regionkey": IntegralType, "r_name": StringType},
}


@pytest.mark.parametrize("table", sorted(CONTRACT))
def test_table_meets_contract(spark, sf_dir, table):
    from prac_data_pipelines_spark.sources import load_table

    df = load_table(spark, sf_dir, table)
    fields = {f.name: f.dataType for f in df.schema.fields}
    for col, family in CONTRACT[table].items():
        assert col in fields, (
            f"{table}.{col} missing — harness schema changed; update the "
            f"source seam (sources/registry.py) and this contract together")
        fam_name = (family.__name__ if isinstance(family, type)
                    else "/".join(f.__name__ for f in family))
        assert isinstance(fields[col], family), (
            f"{table}.{col} is {fields[col]}, expected {fam_name} — "
            f"normalize the new representation at the source seam "
            f"(operators/timeops.py pattern), do not patch queries")


def test_embedding_element_type(spark, sf_dir):
    from prac_data_pipelines_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dtype = emb.schema["embedding"].dataType
    assert isinstance(dtype.elementType, (FloatType, NumericType))

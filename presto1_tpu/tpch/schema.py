"""TPC-H schema: column names/types in table order.

Mirrors the reference's ``plugin/trino-tpch/.../TpchMetadata.java`` typing,
except money columns are DECIMAL(12,2) (exact scaled int64 on device)
instead of DOUBLE — see types.py for the policy.
"""

from ..types import BIGINT, DATE, DecimalType, INTEGER, VARCHAR

MONEY = DecimalType(12, 2)

TABLES = {
    "region": [
        ("r_regionkey", BIGINT), ("r_name", VARCHAR), ("r_comment", VARCHAR),
    ],
    "nation": [
        ("n_nationkey", BIGINT), ("n_name", VARCHAR),
        ("n_regionkey", BIGINT), ("n_comment", VARCHAR),
    ],
    "supplier": [
        ("s_suppkey", BIGINT), ("s_name", VARCHAR), ("s_address", VARCHAR),
        ("s_nationkey", BIGINT), ("s_phone", VARCHAR), ("s_acctbal", MONEY),
        ("s_comment", VARCHAR),
    ],
    "customer": [
        ("c_custkey", BIGINT), ("c_name", VARCHAR), ("c_address", VARCHAR),
        ("c_nationkey", BIGINT), ("c_phone", VARCHAR), ("c_acctbal", MONEY),
        ("c_mktsegment", VARCHAR), ("c_comment", VARCHAR),
    ],
    "part": [
        ("p_partkey", BIGINT), ("p_name", VARCHAR), ("p_mfgr", VARCHAR),
        ("p_brand", VARCHAR), ("p_type", VARCHAR), ("p_size", INTEGER),
        ("p_container", VARCHAR), ("p_retailprice", MONEY),
        ("p_comment", VARCHAR),
    ],
    "partsupp": [
        ("ps_partkey", BIGINT), ("ps_suppkey", BIGINT),
        ("ps_availqty", INTEGER), ("ps_supplycost", MONEY),
        ("ps_comment", VARCHAR),
    ],
    "orders": [
        ("o_orderkey", BIGINT), ("o_custkey", BIGINT),
        ("o_orderstatus", VARCHAR), ("o_totalprice", MONEY),
        ("o_orderdate", DATE), ("o_orderpriority", VARCHAR),
        ("o_clerk", VARCHAR), ("o_shippriority", INTEGER),
        ("o_comment", VARCHAR),
    ],
    "lineitem": [
        ("l_orderkey", BIGINT), ("l_partkey", BIGINT), ("l_suppkey", BIGINT),
        ("l_linenumber", INTEGER), ("l_quantity", MONEY),
        ("l_extendedprice", MONEY), ("l_discount", MONEY), ("l_tax", MONEY),
        ("l_returnflag", VARCHAR), ("l_linestatus", VARCHAR),
        ("l_shipdate", DATE), ("l_commitdate", DATE), ("l_receiptdate", DATE),
        ("l_shipinstruct", VARCHAR), ("l_shipmode", VARCHAR),
        ("l_comment", VARCHAR),
    ],
}

# small closed vocabularies: encoded without a full np.unique pass
ENUM_VOCABS = {
    ("lineitem", "l_returnflag"): ["A", "N", "R"],
    ("lineitem", "l_linestatus"): ["F", "O"],
    ("orders", "o_orderstatus"): ["F", "O", "P"],
}

# primary keys per the TPC-H spec §1.4 (reference: the statistics the
# trino-tpch connector derives in plugin/trino-tpch/.../statistics/)
PRIMARY_KEYS = {
    "region": [("r_regionkey",)],
    "nation": [("n_nationkey",)],
    "supplier": [("s_suppkey",)],
    "customer": [("c_custkey",)],
    "part": [("p_partkey",)],
    "partsupp": [("ps_partkey", "ps_suppkey")],
    "orders": [("o_orderkey",)],
    "lineitem": [("l_orderkey", "l_linenumber")],
}

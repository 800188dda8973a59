"""CIDR containment / longest-prefix-match join — J8.

Reference semantics: ``geoinfo/main.py:372-412`` builds a radix tree and
calls ``search_covering`` per row — a driver-side loop that cannot
distribute. The Spark-first shape is a PREFIX-LENGTH FAN-OUT equi-join:

1. networks parse to (net_long, plen); the distinct prefix lengths
   present form a tiny dimension (<= 33 rows, broadcast);
2. each probe IP fans out to one row per distinct plen with the ip
   truncated to that many bits — so candidate generation is an EQUI-join
   on (plen, truncated_ip), never a theta/range join. Cost is
   O(|ips| x distinct_plens), shuffle keys are uniform hashes, and a
   hot /8 cannot blow up: each (plen, prefix) bucket holds exactly the
   networks that share that prefix.
3. longest match wins via ONE packed-long HashAggregate (plen in the
   high bits of plen<<33 + prefix, so max() picks the longest match);
   the wide candidate fan-out never feeds a join — only the slim
   per-ip winner table joins back onto the original probe rows.

Everything is whole-stage-codegen expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ip_to_long(col):
    """Dotted-quad string -> unsigned 32-bit value in a long (codegen)."""
    p = F.split(col, r"\.")
    return (
        p[0].cast("long") * 16777216
        + p[1].cast("long") * 65536
        + p[2].cast("long") * 256
        + p[3].cast("long")
    )


def parse_cidr(df: DataFrame, cidr_col: str = "cidr") -> DataFrame:
    """Add (net_long, plen, net_prefix) parsed from 'a.b.c.d/len'."""
    net = F.split(F.col(cidr_col), "/")
    out = (
        df.withColumn("plen", net[1].cast("int"))
        .withColumn("_net_long", ip_to_long(net[0]))
    )
    # normalize: truncate the network address to its own prefix length
    # (tolerates non-canonical CIDRs like 10.1.2.3/8). shiftright with a
    # COLUMN bit count needs the SQL form.
    return out.withColumn(
        "net_prefix",
        F.expr("CASE WHEN plen > 0 THEN shiftright(_net_long, 32 - plen) ELSE 0 END"),
    ).drop("_net_long")


def long_to_cidr(prefix_col: str, plen_col: str):
    """(prefix bits, plen) column NAMES -> canonical 'a.b.c.d/len' string.
    SQL-expr form because shiftleft with a COLUMN bit count has no
    Column-API overload."""
    addr = f"(CASE WHEN {plen_col} > 0 THEN shiftleft({prefix_col}, 32 - {plen_col}) ELSE 0 END)"
    return F.expr(
        "concat("
        f"CAST(shiftright({addr}, 24) & 255 AS STRING), '.',"
        f"CAST(shiftright({addr}, 16) & 255 AS STRING), '.',"
        f"CAST(shiftright({addr}, 8) & 255 AS STRING), '.',"
        f"CAST({addr} & 255 AS STRING), '/', CAST({plen_col} AS STRING))"
    )


def cidr_longest_match(
    ips: DataFrame,
    networks: DataFrame,
    ip_col: str = "ip",
    cidr_col: str = "cidr",
) -> DataFrame:
    """For each input row, the longest CIDR covering its ``ip_col``
    (rows with no covering network are dropped — inner-join semantics,
    matching the reference's search_covering hit path).

    Returns the input columns + (cidr, plen); the cidr is CANONICAL
    (network address truncated to its prefix length), so duplicate
    spellings of the same network collapse. Every aggregate is a
    HashAggregate over fixed-width buffers — no string aggregation, no
    SortAggregate, no per-probe dedup (networks are deduped once, on the
    tiny dimension side).
    """
    nets = (
        parse_cidr(networks, cidr_col)
        .select("plen", "net_prefix")
        .dropDuplicates(["plen", "net_prefix"])
    )
    plens = nets.select("plen").distinct()

    probe = ips.withColumn("_ip_long", ip_to_long(F.col(ip_col)))
    # fan-out: one candidate row per (probe, distinct plen) — <=33x
    cand = (
        probe.join(F.broadcast(plens))
        .withColumn(
            "_pfx",
            F.expr("CASE WHEN plen > 0 THEN shiftright(_ip_long, 32 - plen) ELSE 0 END"),
        )
        .join(
            F.broadcast(nets).withColumnRenamed("net_prefix", "_pfx"),
            ["plen", "_pfx"],
        )
    )
    # longest match per probe ip value, resolved entirely inside ONE
    # HashAggregate: pack (plen, prefix) into a single long with plen in
    # the high bits (prefix < 2^32, so plen<<33 + prefix never collides
    # across plens) — max(pack) IS the longest match, and exactly one
    # deduped network exists per (plen, prefix), so no tie-breaking and
    # no join back onto the wide candidate fan-out. Only the slim
    # (ip, winner) table feeds the final join, against the ORIGINAL
    # probe rows — the |ips| x |plens| candidate set never crosses a
    # join boundary.
    win = (
        cand.groupBy(ip_col)
        .agg(
            F.max(
                F.shiftleft(F.col("plen").cast("long"), 33) + F.col("_pfx")
            ).alias("_w")
        )
        .withColumn("plen", F.shiftright(F.col("_w"), 33).cast("int"))
        .withColumn(
            "_pfx", F.col("_w") - F.shiftleft(F.col("plen").cast("long"), 33)
        )
    )
    return ips.join(win, ip_col).select(
        *ips.columns, "plen", long_to_cidr("_pfx", "plen").alias(cidr_col)
    )

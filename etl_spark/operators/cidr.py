"""CIDR containment / longest-prefix-match join — J8 (IPv4 and IPv6).

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
    """Dotted-quad string -> unsigned 32-bit value in a long; NULL for
    anything that is not a.b.c.d with all octets 0-255. ANSI-safe by
    construction (``get`` + ``try_cast``, nothing throws on dirty rows
    — Spark 4 defaults ansi=true, where a bare getItem/cast aborts the
    whole job on one malformed feed line). Octet range is enforced, not
    just shape: '1.2.3.999' would otherwise carry into the third octet
    and alias 1.2.6.231, longest-prefix-matching a network the probe
    does not belong to."""
    p = F.split(col, r"\.")
    octs = [F.get(p, i).try_cast("long") for i in range(4)]
    ok = F.size(p) == 4
    for o in octs:
        ok = ok & o.isNotNull() & (o >= 0) & (o <= 255)
    return F.when(
        ok, octs[0] * 16777216 + octs[1] * 65536 + octs[2] * 256 + octs[3]
    )


def parse_cidr(df: DataFrame, cidr_col: str = "cidr") -> DataFrame:
    """Add (plen, net_prefix) parsed from 'a.b.c.d/len'; non-parseable
    or out-of-range rows are DROPPED (same contract as parse_cidr6)."""
    net = F.split(F.col(cidr_col), "/")
    out = (
        df.withColumn("plen", F.get(net, 1).try_cast("int"))
        .withColumn("_net_long", ip_to_long(F.get(net, 0)))
        .where(
            (F.size(net) == 2)
            & F.col("plen").between(0, 32)
            & F.col("_net_long").isNotNull()
        )
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


# --------------------------------------------------------------------------
# IPv6 (reference parity: route6 records and IPv6 GeoLite blocks,
# geoinfo/geoinfo.py:88-116 parse, :258-316 the ipv6 merge pipeline)
# --------------------------------------------------------------------------

_HEXTET = "[0-9a-fA-F]{1,4}"


def ip6_parse(col):
    """IPv6 string -> (valid, hi, lo) expressions: the 128-bit address
    as two longs (bits 127..64 and 63..0, unsigned-in-signed). Handles
    '::' compression anywhere (including leading/trailing/sole '::');
    IPv4-embedded tails ('::ffff:1.2.3.4') and malformed strings parse
    as valid=false — callers drop them instead of mis-matching.

    Grammar as two anchored regexes (full form; compact form with one
    '::' and 0-6 hextets per side) plus a hextet-count bound — the '::'
    must expand at least one group, which a regex alone cannot count.
    Chosen over the earlier array-HOF formulation (split + filter +
    forall) because higher-order array functions evaluate interpreted,
    outside whole-stage codegen: measured 2-3x faster on a 100k-probe
    parse, byte-identical verdicts (the hypothesis fuzz in
    tests/test_operators.py cross-checks both validity and value against
    Python's ipaddress)."""
    is_full = col.rlike(f"^{_HEXTET}(:{_HEXTET}){{7}}$")
    is_compact = col.rlike(
        f"^({_HEXTET}(:{_HEXTET}){{0,6}})?::({_HEXTET}(:{_HEXTET}){{0,6}})?$"
    )
    cnt = F.regexp_count(col, F.lit("[0-9a-fA-F]+"))
    valid = is_full | (is_compact & (cnt <= 7))
    # expand '::' to the missing zero groups, then strip the edge colons
    # a leading/trailing '::' leaves behind. repeat() of a negative count
    # (9+ hextets, invalid anyway) yields '' — no ANSI throw.
    zeros = F.concat(F.lit(":"), F.repeat(F.lit("0:"), (F.lit(8) - cnt).cast("int")))
    expanded = F.when(is_full, col).otherwise(
        F.regexp_replace(F.regexp_replace(col, "::", zeros), "^:|:$", "")
    )
    groups = F.split(expanded, ":")
    # hi/lo are only ever CONSUMED behind a valid-filter, but nothing
    # forces the optimizer to evaluate the filter first in every future
    # plan shape, and under ANSI each unguarded step here can abort the
    # job on an INVALID row (fuzz-found, tests/test_operators.py): a
    # bare element_at when groups has < 8 entries, conv() overflow on a
    # token longer than 16 hex chars, cast() of conv's garbage output.
    # try_element_at + a length gate + try_cast make the lane math
    # total: invalid rows yield NULL lanes, never an exception.
    hx = []
    for i in range(8):
        g = F.try_element_at(groups, F.lit(i + 1))
        g = F.when((F.length(g) >= 1) & (F.length(g) <= 4), g)
        hx.append(F.conv(g, 16, 10).try_cast("long"))
    hi = (
        F.shiftleft(hx[0], 48)
        .bitwiseOR(F.shiftleft(hx[1], 32))
        .bitwiseOR(F.shiftleft(hx[2], 16))
        .bitwiseOR(hx[3])
    )
    lo = (
        F.shiftleft(hx[4], 48)
        .bitwiseOR(F.shiftleft(hx[5], 32))
        .bitwiseOR(F.shiftleft(hx[6], 16))
        .bitwiseOR(hx[7])
    )
    return valid, hi, lo


# top-k-bit mask of one 64-bit lane, k a COLUMN (SQL form: shiftleft with
# a column bit count has no Column-API overload)
def _lane_mask(k: str) -> str:
    return (
        f"CASE WHEN {k} <= 0 THEN CAST(0 AS BIGINT) "
        f"WHEN {k} >= 64 THEN CAST(-1 AS BIGINT) "
        f"ELSE shiftleft(CAST(-1 AS BIGINT), 64 - {k}) END"
    )


def _mask6(df: DataFrame, hi: str, lo: str, plen: str) -> DataFrame:
    """Truncate (hi, lo) to the top ``plen`` bits (left-aligned masks —
    the canonical network address, so equal prefixes compare equal)."""
    return (
        df.withColumn("_khi", F.least(F.col(plen), F.lit(64)))
        .withColumn("_klo", F.greatest(F.col(plen) - 64, F.lit(0)))
        .withColumn("pfx_hi", F.col(hi).bitwiseAND(F.expr(_lane_mask("_khi"))))
        .withColumn("pfx_lo", F.col(lo).bitwiseAND(F.expr(_lane_mask("_klo"))))
        .drop("_khi", "_klo", hi, lo)
    )


def parse_cidr6(df: DataFrame, cidr_col: str = "cidr") -> DataFrame:
    """Add (plen, pfx_hi, pfx_lo) parsed from 'h:h::h/len'; non-parseable
    or out-of-range rows are dropped. Non-canonical network addresses
    (bits set beyond the prefix) are truncated, so duplicate spellings
    of one network collapse."""
    s = F.split(F.col(cidr_col), "/")
    # get + try_cast, never getItem/cast: under ANSI (Spark 4 default) a
    # slash-less or non-numeric-length row would abort the job instead
    # of being dropped
    valid, hi, lo = ip6_parse(F.get(s, 0))
    out = (
        df.withColumn("plen", F.get(s, 1).try_cast("int"))
        .withColumn("_v", valid)
        .withColumn("_hi", hi)
        .withColumn("_lo", lo)
        .where((F.size(s) == 2) & F.col("_v") & F.col("plen").between(0, 128))
        .drop("_v")
    )
    return _mask6(out, "_hi", "_lo", "plen")


def long_to_cidr6(pfx_hi: str, pfx_lo: str, plen: str):
    """(hi, lo, plen) column NAMES -> canonical full-form IPv6 CIDR
    string: eight lowercase zero-padded hextets ('2001:0db8:...:0000/32'
    — the uncompressed RFC 5952 §2 form, chosen so both engines format
    identically without a compression algorithm)."""
    hexts = []
    for lane in (pfx_hi, pfx_lo):
        for i in range(4):
            h = F.shiftrightunsigned(F.col(lane), 48 - 16 * i).bitwiseAND(
                F.lit(0xFFFF)
            )
            hexts.append(F.lpad(F.lower(F.hex(h)), 4, "0"))
    return F.concat(
        F.concat_ws(":", *hexts), F.lit("/"), F.col(plen).cast("string")
    )


def cidr6_longest_match(
    ips: DataFrame,
    networks: DataFrame,
    ip_col: str = "ip",
    cidr_col: str = "cidr",
) -> DataFrame:
    """IPv6 longest-prefix match — same plan shape as the v4 operator
    (prefix-length fan-out equi-join, see module docstring) with the
    128-bit address carried as two longs. The equi-join key is
    (plen, pfx_hi, pfx_lo); the winner per probe is one HashAggregate
    of max(plen) + max_by(prefix lanes, plen) — deterministic because
    after network dedup each (ip, plen) has at most one candidate.
    Returns input columns + (cidr, plen), cidr canonical full-form."""
    nets = (
        parse_cidr6(networks, cidr_col)
        .select("plen", "pfx_hi", "pfx_lo")
        .dropDuplicates(["plen", "pfx_hi", "pfx_lo"])
    )
    plens = nets.select("plen").distinct()

    valid, hi, lo = ip6_parse(F.col(ip_col))
    probe = (
        ips.withColumn("_v", valid)
        .withColumn("_iphi", hi)
        .withColumn("_iplo", lo)
        .where(F.col("_v"))
        .drop("_v")
    )
    cand = _mask6(probe.join(F.broadcast(plens)), "_iphi", "_iplo", "plen").join(
        F.broadcast(nets), ["plen", "pfx_hi", "pfx_lo"]
    )
    win = cand.groupBy(ip_col).agg(
        F.max("plen").alias("plen"),
        F.max_by("pfx_hi", "plen").alias("pfx_hi"),
        F.max_by("pfx_lo", "plen").alias("pfx_lo"),
    )
    return ips.join(win, ip_col).select(
        *ips.columns, "plen",
        long_to_cidr6("pfx_hi", "pfx_lo", "plen").alias(cidr_col),
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

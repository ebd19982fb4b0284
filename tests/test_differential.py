"""Randomized differential tests: Spark operator vs a pure-Python reference
implementation on seeded random inputs (one Spark job per property, not per
example — hypothesis-style coverage without per-example JVM round-trips).

References implemented in Python exactly as the PHP source describes:
- HttpHeaders::merge/addTo (src/Utils/HttpHeaders.php:27-61)
- QueryParamsPaginator Incrementor (QueryParams/Incrementor.php:22-38)
- RetryManager::shallBeRetried (Cache/RetryManager.php:43-49)
"""

import random
import re
import string

from pyspark.sql import functions as F

from crawlspark import steps

SEED = 20260817


def _rand_word(rng, n=6):
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))


# --------------------------------------------------------------------------
# HttpHeaders.merge
# --------------------------------------------------------------------------

def test_merge_headers_matches_reference(spark):
    rng = random.Random(SEED)
    names = ["Accept", "X-A", "X-B", "Cookie"]
    vals = ["v1", "v2", "v3", "v4"]
    lrows, rrows, expected = [], [], {}
    for case in range(60):
        left = [
            (rng.choice(names), i + 1, rng.choice(vals))
            for i in range(rng.randint(0, 4))
        ]
        # left itself must be a valid normalized header map: same (name,
        # value) may repeat only as the reference would produce it — allow it
        right = [
            (rng.choice(names), i + 1, rng.choice(vals))
            for i in range(rng.randint(0, 4))
        ]
        lrows += [(case, n, p, v) for n, p, v in left]
        rrows += [(case, n, p, v) for n, p, v in right]
        # python reference operates per case; left dups are preserved as-is
        out = {}
        for n, p, v in sorted(left, key=lambda t: t[1]):
            out.setdefault(n, []).append(v)
        for n, p, v in sorted(right, key=lambda t: t[1]):
            if n not in out:
                out[n] = [v]
            elif v not in out[n]:
                out[n].append(v)
        expected[case] = {
            (n, i + 1, v) for n, vs in out.items() for i, v in enumerate(vs)
        }
    schema = "row_id LONG, header_name STRING, pos LONG, value STRING"
    l = spark.createDataFrame(lrows or [(0, "x", 1, "y")], schema)
    r = spark.createDataFrame(rrows or [(0, "x", 1, "y")], schema)
    if not lrows:
        l = l.limit(0)
    if not rrows:
        r = r.limit(0)
    got = {}
    for row in steps.merge_headers_df(l, r, id_col="row_id").collect():
        got.setdefault(row.row_id, set()).add(
            (row.header_name, row.pos, row.value)
        )
    for case, exp in expected.items():
        assert got.get(case, set()) == exp, f"case {case}"


# --------------------------------------------------------------------------
# query-param rewrite (the paginator's step expression)
# --------------------------------------------------------------------------

def _py_increment(url, param, by):
    """Reference Incrementor: set param to current+by; None if absent."""
    m = re.search(r"[?&]" + re.escape(param) + r"=(\d+)", url)
    if not m:
        return None
    new = int(m.group(1)) + by
    return re.sub(
        r"([?&]" + re.escape(param) + r"=)\d+", lambda g: g.group(1) + str(new), url
    )


def test_param_rewrite_matches_reference(spark):
    rng = random.Random(SEED + 1)
    param = "page"
    cases = []
    for i in range(80):
        parts = []
        if rng.random() < 0.8:
            parts.append(f"page={rng.randint(0, 99)}")
        for _ in range(rng.randint(0, 3)):
            name = rng.choice(["perpage", "size", "pageset", _rand_word(rng)])
            parts.append(f"{name}={rng.randint(0, 99)}")
        rng.shuffle(parts)
        url = "http://s.test/r" + ("?" + "&".join(parts) if parts else "")
        cases.append((i, url))
    df = spark.createDataFrame(cases, "case LONG, url STRING")
    pfx = r"[?&]" + re.escape(param) + "="
    cur = F.regexp_extract(F.col("url"), "(" + pfx + r")(\d+)", 2).try_cast("long")
    rewritten = F.when(
        cur.isNotNull(),
        F.regexp_replace(
            F.col("url"), "(?<pfx>" + pfx + r")\d+",
            F.concat(F.lit("${pfx}"), (cur + 1).cast("string")),
        ),
    )
    got = {r.case: r.out for r in df.select("case", rewritten.alias("out")).collect()}
    for i, url in cases:
        assert got[i] == _py_increment(url, param, 1), url


# --------------------------------------------------------------------------
# RetryManager
# --------------------------------------------------------------------------

def test_retry_filter_matches_reference(spark):
    rng = random.Random(SEED + 2)
    statuses = [rng.choice([200, 301, 400, 404, 410, 429, 500, 503]) for _ in range(64)]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(statuses)],
                               "i LONG, status INT")
    for only, except_ in [(None, None), ([429, 503], None), (None, [404, 410]),
                          ([500], [500])]:
        got = {
            r.i: r.x
            for r in df.select(
                "i", steps.retry_filter(F.col("status"), only, except_).alias("x")
            ).collect()
        }
        for i, s in enumerate(statuses):
            ref = (
                s >= 400
                and (except_ is None or s not in except_)
                and (only is None or s in only)
            )
            assert got[i] == ref, (s, only, except_)

"""Full cookie semantics vs the reference's own test fixtures.

Mirrors tests/Loader/Http/Cookies/CookieTest.php (40 cases) and
CookieJarTest.php at both layers (Column + Python twin), plus a
differential test asserting the two layers agree case-by-case.
"""

import pytest
from pyspark.sql import functions as F

from crawlspark import cookies as ck

NOW = 1_700_000_000  # fixed 'now' for expiry checks (determinism)


# ---- parse cases: (received_from_url, header, expected or None) ----------
# expected: dict of parsed fields to check; None = invalid (reference throws)
PARSE_CASES = [
    # name/value basics (CookieTest.php:30-43)
    ("https://www.crwlr.software/packages", "cookieNameWithoutValueIsInvalid", None),
    (
        "https://www.crwlr.software/blog",
        "crwlrsoftware_session=foobar",
        {"cookie_name": "crwlrsoftware_session", "cookie_value": "foobar"},
    ),
    # default domain = registrable domain of the received-from url (:45-50)
    (
        "https://www.otsch.codes/blog",
        "otschcodes_session=cook13",
        {"cookie_domain": "otsch.codes"},
    ),
    # Expires parse, dashed COOKIE format (:52-59)
    (
        "https://www.otsch.codes/blog",
        "otschcodes_session=cook13; Expires=Wed, 23-Feb-2022 10:13:41 GMT",
        {"expires_ts": 1645611221},
    ),
    # Max-Age (:61-65)
    (
        "https://www.otsch.codes/blog",
        "otschcodes_session=cook13; Max-Age=600",
        {"max_age": 600},
    ),
    # Domain attribute (:67-70)
    (
        "https://sub.domain.example.com/foobar",
        "fookie=cook13; domain=domain.example.com",
        {"cookie_domain": "domain.example.com"},
    ),
    # foreign / non-contained domains rejected (:72-78)
    ("https://sub.domain.example.com/foobar", "fookie=cook13; domain=crwl.io", None),
    (
        "https://sub.domain.example.com/foobar",
        "fookie=cook13; domain=foo.example.com",
        None,
    ),
    # leading dot ignored (:80-83)
    (
        "https://sub.domain.example.com/",
        "fookie=cook13; domain=.domain.example.com",
        {"cookie_domain": "domain.example.com"},
    ),
    # Path (:85-88)
    (
        "https://sub.domain.example.com/foobar",
        "co=asdf2345; path=/foobar",
        {"cookie_path": "/foobar"},
    ),
    # Secure flag; secure-from-http rejected (:90-100)
    ("https://sub.domain.example.com/foobar", "co=asdf2345; Secure", {"secure": True}),
    ("http://www.example.io/foobar", "eggs=ample; Secure", None),
    # SameSite values + rejection (:102-109)
    ("https://www.example.io/foobar", "eggs=ample; SameSite=Strict", {"same_site": "Strict"}),
    ("https://www.example.io/foobar", "eggs=ample; SameSite=Lax", {"same_site": "Lax"}),
    ("https://www.example.io/foobar", "eggs=ample; SameSite=None", {"same_site": "None"}),
    ("https://www.example.io/foobar", "eggs=ample; SameSite=Foo", None),
    # HttpOnly (:111-114)
    ("https://jobs.foo.bar/", "csrf=asdfjkloe123; HttpOnly", {"http_only": True}),
    # multiple attributes (:116-124)
    (
        "https://www.crwl.io",
        "__Secure-cook13N4m3=c00k1eV4lu3; Expires=Wed, 23-Feb-2022 10:13:41 GMT; Secure; Path=/foo",
        {"secure": True, "cookie_path": "/foo", "expires_ts": 1645611221},
    ),
    # prefix rules (:126-160)
    ("http://example.com", "__Secure-Abc=defg123; Secure", None),
    ("http://example.com", "__Host-Abc=defg123; Secure", None),
    ("https://example.com", "__Secure-Abc=defg123;", None),
    ("https://example.com", "__Host-Abc=defg123;", None),
    ("https://www.crwl.io", "__Secure-Foo=bar123; Secure", {"secure": True}),
    (
        "https://www.crwlr.software/",
        "__Host-Foo=bar123; Secure; Domain=www.crwlr.software; Path=/",
        None,
    ),
    ("https://www.crwlr.software/", "__Host-Foo=bar123; Secure;", None),
    ("https://www.crwlr.software/", "__Host-Foo=bar123; Secure; Path=/foo", None),
    (
        "https://www.crwlr.software/",
        "__Host-Foo=bar123; Secure; Path=/",
        {"cookie_name": "__Host-Foo"},
    ),
]

# ---- shouldBeSentTo cases: (received_from, header, target, expected) -----
SEND_CASES = [
    # domain mismatches (CookieTest.php:162-174)
    ("https://www.crwlr.software", "cookie=value", "https://www.otsch.codes", False),
    ("https://www.crwlr.software", "cookie=value; Domain=www.crwlr.software", "https://jobs.crwlr.software", False),
    ("https://www.crwlr.software", "cookie=value; Domain=www.crwlr.software", "https://crwlr.software", False),
    ("https://sub.domain.crwlr.software", "cookie=value; Domain=sub.domain.crwlr.software", "https://sab.domain.crwlr.software", False),
    ("https://sub.domain.crwlr.software", "cookie=value; Domain=sub.domain.crwlr.software", "https://domain.crwlr.software", False),
    # domain matches (:176-185)
    ("https://www.crwlr.software", "cookie=value", "https://www.crwlr.software", True),
    ("https://www.crwlr.software", "cookie=value", "https://crwlr.software", True),
    ("https://www.crwlr.software", "cookie=value", "https://anything.crwlr.software", True),
    ("https://sub.domain.crwlr.software", "cookie=value; Domain=domain.crwlr.software", "https://domain.crwlr.software", True),
    ("https://sub.domain.crwlr.software", "cookie=value; Domain=domain.crwlr.software", "https://sab.domain.crwlr.software", True),
    # __Host- exact host (:187-197)
    ("https://www.crwlr.software", "__Host-cookie=value; Secure; Path=/", "https://jobs.crwlr.software", False),
    ("https://sub.domain.crwlr.software", "__Host-cookie=value; Secure; Path=/", "https://domain.crwlr.software", False),
    ("https://subdomain.crwlr.software", "__Host-cookie=value; Secure; Path=/", "https://sabdomain.crwlr.software", False),
    # secure flag vs scheme (:199-212)
    ("https://www.crwl.io", "cookie=value; Secure", "http://www.crwl.io", False),
    ("https://www.crwl.io", "cookie=value; Secure", "https://www.crwl.io", True),
    ("https://localhost", "cookie=value; Secure", "http://localhost", True),
    ("https://127.0.0.1", "cookie=value; Secure", "http://127.0.0.1", True),
    # path matching (:214-238)
    ("https://www.crwlr.software", "cookie=value; Path=/foo", "https://www.crwlr.software/bar", False),
    ("https://www.crwlr.software", "cookie=value; Path=/foo", "https://www.crwlr.software/foobar", False),
    ("https://www.crwlr.software", "cookie=value; Path=/foo", "https://www.crwlr.software/", False),
    ("https://www.crwlr.software", "cookie=value; Path=/foo", "https://www.crwlr.software/bar/foo", False),
    ("https://www.crwlr.software", "cookie=value; Path=/", "https://www.crwlr.software/anything", True),
    ("https://www.crwlr.software", "cookie=value; Path=/foo", "https://www.crwlr.software/foo", True),
    ("https://www.crwlr.software", "cookie=value; Path=/foo", "https://www.crwlr.software/foo/something", True),
    ("https://www.crwlr.software", "cookie=value; Path=/foo", "https://www.crwlr.software/foo/some/thing", True),
    # expiry (:240-278): expires in the past / future, max-age reached,
    # zero/negative max-age
    ("https://www.crwlr.software", "cookie=value; Expires=Tue, 14 Nov 2023 22:13:19 GMT", "https://www.crwlr.software", False),  # NOW-1
    ("https://www.crwlr.software", "cookie=value; Expires=Tue, 14 Nov 2023 22:13:25 GMT", "https://www.crwlr.software", True),  # NOW+5
    ("https://www.crwlr.software", "cookie=value; Max-Age=1", "https://www.crwlr.software", False),  # received_at=NOW-2
    ("https://www.crwlr.software", "cookie=value; Max-Age=0", "https://www.crwlr.software", False),
    ("https://www.crwlr.software", "cookie=value; Max-Age=-5", "https://www.crwlr.software", False),
    ("https://www.crwlr.software", "cookie=value; Max-Age=600", "https://www.crwlr.software", True),
]
RECEIVED_AT = NOW - 2  # makes Max-Age=1 expired, Max-Age=600 live


def test_parse_cases_python_twin():
    for url, header, expected in PARSE_CASES:
        c = ck.parse_set_cookie_py(url, header, received_at=RECEIVED_AT)
        if expected is None:
            assert c is None, f"expected invalid: {header!r} from {url}"
        else:
            assert c is not None, f"expected valid: {header!r} from {url}"
            for k, v in expected.items():
                attr = {
                    "cookie_name": "name",
                    "cookie_value": "value",
                    "cookie_domain": "domain",
                    "cookie_path": "path",
                    "expires_ts": "expires_ts",
                    "max_age": "max_age",
                    "secure": "secure",
                }.get(k)
                if attr is None:  # same_site not kept on PyCookie
                    continue
                assert getattr(c, attr) == v, (header, k)


def test_parse_cases_column_layer(spark):
    df = spark.createDataFrame(
        [(i, u, h) for i, (u, h, _) in enumerate(PARSE_CASES)],
        "i LONG, url STRING, set_cookie STRING",
    )
    rows = {
        r["i"]: r
        for r in ck.parse_set_cookie(df, received_at_col=RECEIVED_AT).collect()
    }
    for i, (url, header, expected) in enumerate(PARSE_CASES):
        r = rows[i]
        if expected is None:
            assert r["invalid_reason"] is not None, (header, url)
        else:
            assert r["invalid_reason"] is None, (header, r["invalid_reason"])
            for k, v in expected.items():
                assert r[k] == v, (header, k, r[k])


def test_send_cases_both_layers(spark):
    # python twin
    for url, header, target, expected in SEND_CASES:
        c = ck.parse_set_cookie_py(url, header, received_at=RECEIVED_AT)
        assert c is not None, header
        assert c.should_send(target, NOW) == expected, (header, target)
    # column layer
    df = spark.createDataFrame(
        [(i, u, h, t) for i, (u, h, t, _) in enumerate(SEND_CASES)],
        "i LONG, url STRING, set_cookie STRING, target STRING",
    )
    parsed = ck.parse_set_cookie(df, received_at_col=RECEIVED_AT)
    got = {
        r["i"]: r["send"]
        for r in parsed.select(
            "i", ck.should_send_col(F.col("target"), NOW).alias("send")
        ).collect()
    }
    for i, (url, header, target, expected) in enumerate(SEND_CASES):
        assert got[i] == expected, (header, target)


def test_jar_last_wins_and_domain_keying(spark):
    # CookieJar.php:59 — name-keyed per domain, last set wins; getFor keys
    # by the registrable domain of the target.
    jar = ck.PyCookieJar()
    jar.add_from("https://www.crwl.io/a", ["sid=first"], received_at=NOW)
    jar.add_from("https://jobs.crwl.io/b", ["sid=second"], received_at=NOW)
    jar.add_from("https://other.example/c", ["oid=x"], received_at=NOW)
    got = jar.get_for("https://crwl.io/", NOW)
    assert [f"{c.name}={c.value}" for c in got] == ["sid=second"]
    assert jar.cookie_header("https://crwl.io/", NOW) == "sid=second"
    # column layer equivalent
    df = spark.createDataFrame(
        [
            (0, "https://www.crwl.io/a", "sid=first"),
            (1, "https://jobs.crwl.io/b", "sid=second"),
            (2, "https://other.example/c", "oid=x"),
        ],
        "ord LONG, url STRING, set_cookie STRING",
    )
    jar_df = ck.build_jar(ck.parse_set_cookie(df, received_at_col=NOW))
    reqs = spark.createDataFrame([("https://crwl.io/",)], "target STRING")
    out = ck.jar_matches(jar_df, reqs, url_col="target", now_s=NOW).select(
        "cookie_name", "cookie_value"
    ).collect()
    assert [(r[0], r[1]) for r in out] == [("sid", "second")]


def test_differential_python_vs_column(spark):
    """Randomized lockstep check: generated headers parsed by both layers
    must agree on validity and on every send decision."""
    import random

    rng = random.Random(42)
    hosts = [
        "www.crwlr.software", "sub.domain.example.com", "localhost",
        "user.github.io", "shop.foo.com.au", "127.0.0.1",
    ]
    rows = []
    for i in range(300):
        host = rng.choice(hosts)
        scheme = rng.choice(["http", "https"])
        url = f"{scheme}://{host}/{rng.choice(['', 'a', 'a/b'])}"
        name = rng.choice(["sid", "__Secure-tok", "__Host-tok", "pref"])
        parts = [f"{name}=v{i}"]
        if rng.random() < 0.4:
            parts.append(f"Domain={rng.choice([host, 'example.com', '.crwl.io', host.split('.', 1)[-1]])}")
        if rng.random() < 0.4:
            parts.append(f"Path={rng.choice(['/', '/a', '/a/b', '/c'])}")
        if rng.random() < 0.4:
            parts.append("Secure")
        if rng.random() < 0.3:
            parts.append(f"Max-Age={rng.choice([-1, 0, 1, 600, 'abc'])}")
        if rng.random() < 0.3:
            parts.append(
                f"Expires={rng.choice(['Tue, 14 Nov 2023 22:13:19 GMT', 'Wed, 23-Feb-2022 10:13:41 GMT', 'garbage'])}"
            )
        if rng.random() < 0.2:
            parts.append(f"SameSite={rng.choice(['Strict', 'Lax', 'None', 'Bogus'])}")
        target = f"{rng.choice(['http', 'https'])}://{rng.choice(hosts)}/{rng.choice(['', 'a', 'a/b', 'c/d'])}"
        rows.append((i, url, "; ".join(parts), target))

    df = spark.createDataFrame(rows, "i LONG, url STRING, set_cookie STRING, target STRING")
    parsed = ck.parse_set_cookie(df, received_at_col=RECEIVED_AT)
    col_rows = {
        r["i"]: r
        for r in parsed.select(
            "i", "invalid_reason", ck.should_send_col(F.col("target"), NOW).alias("send")
        ).collect()
    }
    for i, url, header, target in rows:
        py = ck.parse_set_cookie_py(url, header, received_at=RECEIVED_AT)
        cr = col_rows[i]
        assert (py is None) == (cr["invalid_reason"] is not None), (
            url, header, cr["invalid_reason"],
        )
        if py is not None:
            assert py.should_send(target, NOW) == cr["send"], (url, header, target)

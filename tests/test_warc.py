"""WARC ingestion: spec-built fixtures (per-record gzip members, chunked
and content-encoded HTTP) through the streaming parser, the distributed
mapInPandas reader, and the documents projection that feeds the rest of
the curation pipeline."""

from __future__ import annotations

import gzip

import pytest

from sed_binning_spark.pipeline.warc import (
    _dechunk,
    http_response,
    iter_warc_records,
    open_warc,
    read_warc,
    split_http_response,
    warc_to_documents,
    write_warc,
)

BODY = ("<html><body><p>Hello &amp; welcome</p>"
        "<script>x<1</script><p>Second para</p></body></html>").encode()
CLEAN = "Hello & welcome\n\nSecond para"


def _fixture_records():
    return [
        dict(type="warcinfo", payload=b"software: fixture",
             content_type="application/warc-fields"),
        dict(type="response", url="http://a.example/plain",
             payload=http_response(BODY)),
        dict(type="response", url="http://a.example/chunked",
             payload=http_response(BODY, chunked=True)),
        dict(type="response", url="http://a.example/gz",
             payload=http_response(BODY, gzip_body=True)),
        dict(type="response", url="http://a.example/404",
             payload=http_response(b"gone", status=404)),
        dict(type="request", url="http://a.example/plain",
             payload=b"GET /plain HTTP/1.1\r\n\r\n",
             content_type="application/http; msgtype=request"),
        dict(type="response", url="http://a.example/img",
             payload=http_response(b"\x89PNG\x00", content_type="image/png")),
        # mixed-case media type (RFC 9110: tokens are case-insensitive)
        # and a latin-1 body (must become U+FFFD, not a job abort under
        # Spark 4's ANSI decode)
        dict(type="response", url="http://a.example/latin1",
             payload=http_response(b"<p>caf\xe9</p>",
                                   content_type="Text/HTML")),
    ]


@pytest.mark.parametrize("compress", [True, False])
def test_warc_parser_round_trip(tmp_path, compress):
    """Every framing the fixture writer emits parses back: plain and
    per-record-gzip containers; identity, chunked, and gzip-encoded HTTP
    bodies all reduce to the same bytes."""
    p = tmp_path / ("t.warc.gz" if compress else "t.warc")
    write_warc(str(p), _fixture_records(), compress=compress)
    with open_warc(str(p)) as f:
        got = list(iter_warc_records(f))
    assert [h["warc-type"] for h, _ in got] == [
        "warcinfo", "response", "response", "response", "response",
        "request", "response", "response",
    ]
    for idx in (1, 2, 3):
        status, headers, body = split_http_response(got[idx][1])
        assert status == 200 and body == BODY, idx
        assert headers["content-type"].startswith("text/html")
    status, _, body = split_http_response(got[4][1])
    assert status == 404 and body == b"gone"
    # non-HTTP payloads pass through untouched
    assert split_http_response(got[0][1]) == (None, {}, b"software: fixture")


def test_warc_parser_malformed(tmp_path):
    """Framing defects raise named ValueErrors; a truncated chunked body
    keeps the prefix instead of dropping the page."""
    p = tmp_path / "t.warc"
    write_warc(str(p), _fixture_records()[:2], compress=False)
    raw = p.read_bytes()

    q = tmp_path / "trunc.warc"
    q.write_bytes(raw[:-30])
    with pytest.raises(ValueError, match="truncated WARC record"):
        with open_warc(str(q)) as f:
            list(iter_warc_records(f))

    q.write_bytes(b"NOT A WARC\r\n" + raw)
    with pytest.raises(ValueError, match="version line"):
        with open_warc(str(q)) as f:
            list(iter_warc_records(f))

    # chunked body cut mid-chunk: prefix survives
    assert _dechunk(b"5\r\nhello\r\n5\r\nwo") == b"hellowo"[:7]
    assert _dechunk(b"zz\r\njunk") == b""
    # broken gzip content-encoding degrades to the raw bytes
    broken = http_response(b"x", gzip_body=True)[:-1] + b"\x00"
    status, _, body = split_http_response(broken)
    assert status == 200 and body  # evidence kept, no raise


def test_read_warc_distributed_and_documents(spark, tmp_path):
    """read_warc fans one task per file and warc_to_documents yields the
    documents shape: 2xx text responses only, UTF-8 decoded, HTML
    stripped, deterministic distinct doc_ids — composing directly with
    the downstream dedup/quality operators."""
    paths = []
    for fi in range(3):
        recs = [
            dict(type="response", url=f"http://site{fi}.example/{i}",
                 payload=http_response(
                     BODY, chunked=(i % 2 == 0), gzip_body=(i % 3 == 0),
                 ))
            for i in range(5)
        ] + _fixture_records()
        p = tmp_path / f"f{fi}.warc.gz"
        write_warc(str(p), recs)
        paths.append(str(p))
    wdf = read_warc(spark, paths)
    assert wdf.rdd.getNumPartitions() == 3
    # round-robin really deals ONE file per task (hash partitioning left
    # tasks empty: measured [1,0,2] before the fix)
    per_part = wdf.select("path").rdd.glom().map(
        lambda rows: len({r["path"] for r in rows}),
    ).collect()
    assert sorted(per_part) == [1, 1, 1], per_part
    rows = wdf.count()
    assert rows == 3 * (5 + 8)
    docs = warc_to_documents(wdf)
    got = docs.collect()
    # per file: 5 site pages + plain/chunked/gz + the mixed-case latin-1
    # page (404, request, warcinfo, and the PNG are gated out)
    assert len(got) == 3 * (5 + 4)
    by_url = {r["url"]: r["text"] for r in got}
    assert by_url["http://a.example/latin1"] == "caf�"
    assert all(r["text"] in (CLEAN, "caf�") for r in got)
    assert len({r["doc_id"] for r in got}) == len(got)

    from sed_binning_spark.pipeline.dedup import exact_dedup
    from sed_binning_spark.pipeline.text import text_stats

    assert text_stats(docs).count() == len(got)
    # every page shares one of two bodies (CLEAN html vs the latin-1 one)
    assert exact_dedup(docs).count() == 2


def test_read_warc_empty_paths():
    with pytest.raises(ValueError, match="at least one path"):
        read_warc(None, [])


def test_warc_gzip_members_stream_independently(tmp_path):
    """The .warc.gz framing really is one gzip member per record (what
    lets a reader resume mid-file at scale): splitting the file at
    member boundaries yields parseable halves."""
    p = tmp_path / "t.warc.gz"
    recs = _fixture_records()
    write_warc(str(p), recs)
    raw = p.read_bytes()
    # count gzip magic occurrences at member starts by re-splitting
    first = gzip.compress(b"")  # noqa: F841 (documentation of intent)
    offsets = []
    pos = 0
    while True:
        at = raw.find(b"\x1f\x8b\x08", pos)
        if at < 0:
            break
        offsets.append(at)
        pos = at + 1
    assert len(offsets) >= len(recs)  # one member (at least) per record
    half = tmp_path / "half.warc.gz"
    half.write_bytes(raw[offsets[2]:])
    with open_warc(str(half)) as f:
        tail = list(iter_warc_records(f))
    assert [h["warc-type"] for h, _ in tail] == [
        h["warc-type"] for h, _ in
        [(r, None) for r in ({"warc-type": x["type"]} for x in recs[2:])]
    ]


def test_url_canonicalization(spark):
    """Canonical-URL pins: scheme/host case, default-port drop, empty
    path, tracking-param strip with surviving params SORTED, fragment
    drop, unparseable passthrough, NULL passthrough — checked against an
    independent Python urllib reconstruction of the same rules."""
    from urllib.parse import urlsplit

    from sed_binning_spark.pipeline.url import (
        TRACKING_PARAM_REGEX, canonicalize_urls, dedup_by_url,
    )
    import re

    urls = [
        "HTTP://Example.COM:80/a?utm_source=x&b=2&a=1#frag",
        "http://example.com/a?a=1&b=2",
        "https://Example.com:443/",
        "https://example.com",
        "https://example.com:8443/x",
        "http://example.com/a?utm_source=y&b=2&a=1",
        "ftp://Host.net:21/f",
        "http://h.io/p?fbclid=abc&gclid=x",
        "http://h.io/p?keep=1&ref=tw#x",
    ]
    rows = [(i, u) for i, u in enumerate(urls)] + [(97, "not a url"),
                                                   (98, "/relative/only"),
                                                   (99, None)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r["canonical_url"]
           for r in canonicalize_urls(df).collect()}

    def reference(u):
        s = urlsplit(u)
        default = {"http": 80, "https": 443, "ftp": 21}.get(s.scheme.lower())
        port = f":{s.port}" if s.port and s.port != default else ""
        params = sorted(
            p for p in s.query.split("&")
            if p and not re.match(TRACKING_PARAM_REGEX, p)
        )
        q = "?" + "&".join(params) if params else ""
        return (f"{s.scheme.lower()}://{s.hostname}{port}"
                f"{s.path or '/'}{q}")

    for i, u in enumerate(urls):
        assert got[i] == reference(u), (u, got[i], reference(u))
    assert got[97] == "not a url" and got[98] == "/relative/only"
    assert got[99] is None

    d = {r["canonical_url"]: (r["kept_id"], r["n_dups"])
         for r in dedup_by_url(df).collect()}
    # urls 0, 1, 5 all canonicalize to http://example.com/a?a=1&b=2
    assert d["http://example.com/a?a=1&b=2"] == (0, 3)
    # 2 and 3 collapse to https://example.com/
    assert d["https://example.com/"] == (2, 2)
    # NULL url excluded entirely
    assert sum(n for _, n in d.values()) == 11


def test_warc_roundtrip_property():
    """Hypothesis: arbitrary binary bodies under every framing
    combination (container gzip on/off × chunked × content-gzip) survive
    the writer→parser→HTTP-split pipeline byte-for-byte."""
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        bodies=st.lists(st.binary(max_size=1500), min_size=1, max_size=6),
        compress=st.booleans(),
        chunked=st.booleans(),
        gzip_body=st.booleans(),
    )
    @settings(max_examples=30, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def _prop(bodies, compress, chunked, gzip_body):
        recs = [
            dict(type="response", url=f"http://p.example/{i}",
                 payload=http_response(b, chunked=chunked,
                                       gzip_body=gzip_body))
            for i, b in enumerate(bodies)
        ]
        with tempfile.NamedTemporaryFile(suffix=".warc") as tf:
            write_warc(tf.name, recs, compress=compress)
            with open_warc(tf.name) as f:
                got = list(iter_warc_records(f))
        assert len(got) == len(bodies)
        for (headers, payload), body in zip(got, bodies):
            status, _, out = split_http_response(payload)
            assert status == 200 and out == body

    _prop()


def test_warc_dirty_corpus_matrix(spark, tmp_path):
    """The defect classes a real Common Crawl segment contains, each
    degrading per the documented posture — never aborting the job:

    - truncated gzip member mid-record → read_warc keeps the file's
      prior records and stops that file;
    - WARC Content-Length LYING long (past EOF) → same stop-and-keep;
    - WARC Content-Length lying short (garbage between records) → same;
    - HTTP headers with bare-LF line endings → parsed (RFC 9112 §2.2
      recipients-should-accept posture), page survives;
    - HTTP Content-Length header lies → harmless, the WARC record
      bounds the payload, the full body survives;
    - charset declaration contradicting the bytes → UTF-8-with-
      replacement decode keeps the page, never raises."""
    import pandas as pd

    def good(i, body=b"<p>page %d fine.</p>"):
        return dict(type="response", url=f"http://ok{i}.example/x",
                    payload=http_response(body % i))

    # 1. truncated gzip member mid-record: file A has 2 good records,
    # then a third whose gzip member is cut in half
    pa = tmp_path / "a.warc.gz"
    write_warc(str(pa), [good(0), good(1)], compress=True)
    extra = tmp_path / "extra.warc.gz"
    write_warc(str(extra), [good(2)], compress=True)
    cut = extra.read_bytes()
    pa.write_bytes(pa.read_bytes() + cut[: len(cut) // 2])

    # 2. WARC Content-Length lying LONG on the SECOND record (its body
    # length is unique, so the replace targets it): record 3 survives,
    # the lie reads past EOF and stops the file
    pb = tmp_path / "b.warc"
    liar = dict(type="response", url="http://liar.example/x",
                payload=http_response(b"<p>this one lies about length.</p>"))
    write_warc(str(pb), [good(3), liar], compress=False)
    raw = pb.read_bytes()
    lied = raw.replace(
        b"Content-Length: %d" % len(liar["payload"]),
        b"Content-Length: %d" % (len(liar["payload"]) * 10), 1,
    )
    assert lied != raw
    pb.write_bytes(lied)

    # 3. lying SHORT: trailing garbage lands between records, the next
    # readline is not a WARC/ version line
    pc = tmp_path / "c.warc"
    recs = [good(5), good(6)]
    write_warc(str(pc), recs, compress=False)
    raw = pc.read_bytes()
    first_end = raw.index(b"WARC/1.0", 8)  # start of record 2
    pc.write_bytes(raw[:first_end] + b"GARBAGE BYTES\r\n" + raw[first_end:])

    got = read_warc(spark, [str(pa), str(pb), str(pc)]).toPandas()
    by_file = got.groupby(
        got["path"].str.rsplit("/", n=1).str[-1],
    ).size().to_dict()
    # a: both records before the truncated member; b: the record before
    # the length lie; c: the record before the inter-record garbage
    assert by_file == {"a.warc.gz": 2, "b.warc": 1, "c.warc": 1}, by_file

    # 4. bare-LF HTTP headers parse
    lf_payload = (b"HTTP/1.1 200 OK\n"
                  b"Content-Type: text/html; charset=utf-8\n"
                  b"Content-Length: 21\n\n"
                  b"<p>bare lf page.</p>\n")
    status, headers, body = split_http_response(lf_payload)
    assert status == 200
    assert headers["content-type"].startswith("text/html")
    assert body.startswith(b"<p>bare lf page.</p>")

    # 5. HTTP-level Content-Length lies are harmless: the WARC record
    # bounds the payload, so the full body is kept either way
    lying_http = (b"HTTP/1.1 200 OK\r\n"
                  b"Content-Type: text/html\r\n"
                  b"Content-Length: 3\r\n\r\n"
                  b"<p>full body kept.</p>")
    status, _, body = split_http_response(lying_http)
    assert status == 200 and body == b"<p>full body kept.</p>"

    # 6. charset lie: declared utf-8, bytes are latin-1 — the page
    # survives with U+FFFD where the bytes are invalid, never a raise
    pd_path = tmp_path / "d.warc"
    latin = "caf\xe9 r\xe9sum\xe9.".encode("latin-1")
    write_warc(str(pd_path), [dict(
        type="response", url="http://charset.example/x",
        payload=http_response(b"<p>" + latin + b"</p>"),
    )], compress=False)
    docs = warc_to_documents(read_warc(spark, [str(pd_path)])).toPandas()
    assert len(docs) == 1
    assert "caf�" in docs["text"][0] and "r�sum�" in docs["text"][0]

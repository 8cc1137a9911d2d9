"""Edge-case tests for the training-data pipeline operators (the
oracle parity tests cover the happy path on the documents table)."""

from __future__ import annotations

from pyspark.sql import functions as F

from coltt_spark.operators.pipeline import (
    chunk_documents,
    decontaminate,
    pack_sequences,
    shard_assign,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_tail(spark):
    # 10 tokens, size 4, stride 3 → starts 0,3,6,9; last chunk is the tail
    text = " ".join(f"w{i}" for i in range(10))
    out = chunk_documents(
        _docs(spark, [(1, text)]), "doc_id", "text", size=4, stride=3
    ).orderBy("chunk_id").collect()
    assert [r["chunk_id"] for r in out] == [0, 1, 2, 3]
    assert [r["n_tokens"] for r in out] == [4, 4, 4, 1]
    assert out[0]["chunk_text"] == "w0 w1 w2 w3"
    assert out[3]["chunk_text"] == "w9"


def test_chunk_empty_and_short_docs(spark):
    out = chunk_documents(
        _docs(spark, [(1, ""), (2, "   "), (3, "only two")]),
        "doc_id", "text", size=4, stride=3,
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc and 2 not in by_doc  # empty docs emit nothing
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_tokens"] == 2


def test_decontaminate_min_hits_threshold(spark):
    shared = "alpha beta gamma delta epsilon zeta"
    train = _docs(spark, [(1, shared + " tail one"), (2, "nothing in common here at all")])
    bench = _docs(spark, [(100, shared + " other ending")])
    hit = decontaminate(train, bench, "doc_id", "text", ngram=5, min_hits=1).collect()
    assert [r["doc_id"] for r in hit] == [1]
    # raising min_hits above the overlap count empties the result
    none = decontaminate(train, bench, "doc_id", "text", ngram=5, min_hits=99).collect()
    assert none == []


def test_decontaminate_byte_level_sees_cjk(spark):
    """A CJK eval document is INVISIBLE to word-shingle
    decontamination (no [a-z0-9] tokens ⇒ no shingles ⇒ no flag);
    the byte-level mode catches the contaminated training copy —
    and still doesn't flag unrelated CJK text."""
    bench_text = "日本語 の 評価 データ セット の 質問 と 答え"
    train = _docs(
        spark,
        [
            (1, bench_text + " 追記"),                       # contaminated copy
            (2, "完全 に 無関係 な 中国語 の 文章 です よ"),   # unrelated CJK
            (3, "plain ascii words with no overlap at all"),
        ],
    )
    bench = _docs(spark, [(100, bench_text)])
    word = decontaminate(train, bench, "doc_id", "text", ngram=5, min_hits=1).collect()
    assert word == []  # the documented ASCII blind spot
    byte = decontaminate(
        train, bench, "doc_id", "text", min_hits=1, byte_level=True, n_bytes=24
    ).collect()
    assert [r["doc_id"] for r in byte] == [1]
    assert byte[0]["n_benchmark_docs"] == 1


def test_stratified_sample_quota_and_determinism(spark):
    rows = [(i, "x") for i in range(100)]
    df = spark.createDataFrame(
        [(i, "a" if i < 80 else "b") for i, _ in rows], "doc_id long, lang string"
    )
    a = stratified_sample(df, "doc_id", "lang", quota=10).collect()
    b = stratified_sample(df.orderBy(F.rand(7)), "doc_id", "lang", quota=10).collect()
    # quota respected per stratum, and the pick ignores input order
    counts = {}
    for r in a:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    assert counts == {"a": 10, "b": 10}
    assert sorted((r["doc_id"], r["lang"]) for r in a) == sorted(
        (r["doc_id"], r["lang"]) for r in b
    )


def test_stratified_sample_prefilter_matches_full_ranking(spark):
    """The skew-safe hash-threshold pre-filter must not change the
    selected rows: compare against ranking the whole stratum by the
    same (hash, id) key."""
    from coltt_spark.functions.text import hash60

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, lang string",
    )
    got = sorted(
        (r["doc_id"], r["lang"], r["sample_rank"])
        for r in stratified_sample(df, "doc_id", "lang", quota=5).collect()
    )
    from pyspark.sql import Window

    h = hash60(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    want = sorted(
        (r["doc_id"], r["lang"], r["rk"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    )
    assert got == want


def test_keep_canonical_surfaces_missing_scores(spark):
    """A group member without a score row ranks last (nulls last)
    instead of silently vanishing; an entirely unscored group still
    emits a survivor with NULL kept_score."""
    from coltt_spark.operators.components import keep_canonical

    groups = spark.createDataFrame(
        [(1, 10, 2), (2, 10, 2), (3, 30, 2), (4, 30, 2)],
        "id long, root long, group_size long",
    )
    scores = spark.createDataFrame(
        [(2, 0.9)], "id long, quality_score double"
    )  # 1, 3, 4 unscored
    out = {r["root"]: r for r in keep_canonical(groups, scores).collect()}
    assert out[10]["kept_id"] == 2 and out[10]["kept_score"] == 0.9
    assert out[30]["kept_id"] == 3 and out[30]["kept_score"] is None


def test_shard_assign_covers_all_rows(spark):
    df = _docs(spark, [(i, "tok " * 5) for i in range(64)])
    out = shard_assign(df, "doc_id", n_shards=4, text_col="text").collect()
    assert sum(r["n_docs"] for r in out) == 64
    assert all(0 <= r["shard"] < 4 for r in out)
    assert all(r["total_tokens"] == r["n_docs"] * 5 for r in out)


def test_pack_sequences_budget_and_oversize(spark):
    # one shard → deterministic fold; doc of 300 tokens > budget 256
    docs = _docs(
        spark,
        [(1, "t " * 300), (2, "t " * 100), (3, "t " * 100), (4, "t " * 100)],
    )
    out = pack_sequences(docs, "doc_id", "text", budget=256, n_shards=1).collect()
    assert sum(r["n_docs"] for r in out) == 4
    assert sum(r["seq_tokens"] for r in out) == 600
    # every sequence starts a doc below the budget boundary: no seq_id gaps
    seqs = sorted(r["seq_id"] for r in out)
    assert seqs == sorted(set(seqs))


def test_pack_sequences_first_fit_invariants(spark):
    """first_fit mode: a sequence only exceeds the budget when a
    single document alone does; totals conserve the corpus; and its
    restart discipline never packs LESS efficiently per sequence than
    concat-split overshoot would suggest (same doc set, same order)."""
    docs = _docs(
        spark,
        [(1, "t " * 300), (2, "t " * 100), (3, "t " * 100), (4, "t " * 100),
         (5, "t " * 50), (6, "t " * 250)],
    )
    out = pack_sequences(
        docs, "doc_id", "text", budget=256, n_shards=1, mode="first_fit"
    ).collect()
    assert sum(r["n_docs"] for r in out) == 6
    assert sum(r["seq_tokens"] for r in out) == 900
    for r in out:
        assert r["seq_tokens"] <= 256 or r["n_docs"] == 1, dict(r)
    # seq ids are contiguous from 0 (restart discipline, no gaps)
    assert sorted(r["seq_id"] for r in out) == list(range(len(out)))


def test_temperature_sample_flattens_sources(spark):
    """share^0.5 rebalancing: the dominant source is downsampled
    toward its flattened target, minority sources keep every row, and
    the pick is deterministic."""
    from coltt_spark.operators.pipeline import temperature_sample

    rows = [(i, "big" if i < 900 else ("mid" if i < 980 else "tiny")) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_sample(df, "doc_id", "source").collect()
    kept = {}
    for r in out:
        kept.setdefault(r["source"], []).append(r["doc_id"])
    # minority sources are never downsampled (keep-rate capped at 1)
    assert len(kept["tiny"]) == 20 and len(kept["mid"]) == 80
    # dominant source shrinks toward its flattened share
    assert len(kept["big"]) < 900
    rates = {r["source"]: r["keep_rate"] for r in out}
    assert rates["tiny"] == 1.0 and rates["mid"] == 1.0 and rates["big"] < 1.0
    # hash-threshold selection is expectation-accurate on the big source
    assert abs(len(kept["big"]) - rates["big"] * 900) < 90
    again = temperature_sample(df, "doc_id", "source").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_as_of_join_semantics(spark):
    """Greatest right ts <= left ts per key, ties to greatest tie id,
    same-instant rows match, keys never cross, unmatched stays NULL."""
    from datetime import datetime

    from coltt_spark.operators.analytics import as_of_join

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, t(10), 100), (1, t(3), 101), (2, t(5), 102), (3, t(9), 103)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, t(2), 200),   # before both left-1 rows
            (1, t(10), 201),  # same instant as left 100 -> matches it
            (1, t(10), 202),  # tie on ts: greatest event_id wins
            (2, t(6), 203),   # after left 102 -> no match
        ],
        "user_id long, ts timestamp, event_id long",
    )
    res = {
        r["event_id"]: r["asof_event_id"]
        for r in as_of_join(
            left, right, on="user_id", ts_col="ts", tie_col="event_id",
            left_cols=["event_id"], right_cols=["event_id"],
        ).collect()
    }
    assert res == {100: 202, 101: 200, 102: None, 103: None}


def test_as_of_join_randomized_vs_bruteforce(spark):
    """500 random events with heavy ts ties: the distributed as-of
    join must agree with a per-row brute force on every match."""
    import random
    from datetime import datetime, timedelta

    from coltt_spark.operators.analytics import as_of_join

    rng = random.Random(13)
    base = datetime(2024, 3, 1)
    left, right = [], []
    for i in range(250):
        left.append((rng.randint(1, 12), base + timedelta(seconds=rng.randint(0, 120)), 1000 + i))
        right.append((rng.randint(1, 12), base + timedelta(seconds=rng.randint(0, 120)), 2000 + i))
    ldf = spark.createDataFrame(left, "user_id long, ts timestamp, event_id long")
    rdf = spark.createDataFrame(right, "user_id long, ts timestamp, event_id long")
    got = {
        r["event_id"]: r["asof_event_id"]
        for r in as_of_join(
            ldf, rdf, on="user_id", ts_col="ts", tie_col="event_id",
            left_cols=["event_id"], right_cols=["event_id"],
        ).collect()
    }
    for u, lts, lid in left:
        cands = [(rts, rid) for (ru, rts, rid) in right if ru == u and rts <= lts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (u, lts, lid)


def test_redact_pii_semantics(spark):
    """redact_pii finds and replaces emails / phones / SSNs / IPv4 in
    realistic surrounding text, leaves clean text byte-identical,
    and counts before replacing."""
    from coltt_spark.operators.pipeline import redact_pii

    rows = [
        (0, "reach me at John.Doe+spam@sub.example.co.uk or call +44-020-7946"),
        (1, "server at 10.255.3.7, backup 192.168.0.1."),
        (2, "no pii here, just 3.14 and version 2.0 strings"),
        (3, "a@b.io a@b.io a@b.io"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 1
    assert got[0]["text"] == "reach me at [EMAIL] or call [PHONE]"
    assert got[1]["n_ip"] == 2
    assert got[1]["text"] == "server at [IP], backup [IP]."
    assert (got[2]["n_email"], got[2]["n_phone"], got[2]["n_ip"]) == (0, 0, 0)
    assert got[2]["text"] == rows[2][1]
    assert got[3]["n_email"] == 3
    assert got[3]["text"] == "[EMAIL] [EMAIL] [EMAIL]"


def test_redact_pii_phone_shapes(spark):
    """The broadened phone alternation catches the shapes a real
    corpus carries — and does NOT fire on bare digit runs (product
    codes / ids), dates, or SSNs (which get their own token). One
    positive or negative per row so each assertion is diagnostic."""
    from coltt_spark.operators.pipeline import redact_pii

    positives = [
        "+1-555-123-4567", "+1 (555) 123-4567", "+1(555)123-4567",
        "(555) 123-4567", "(555)123-4567", "555-123-4567",
        "555.123.4567", "555 123 4567", "+44 555 123 9876",
        "+1-555-0123",
    ]
    negatives = [
        "5551234567",        # bare 10-digit product code
        "sku 1234567890",    # bare 10-digit id
        "10.0.123.45",       # IPv4 (its own token, not [PHONE])
        "2026-08-14",        # date
        "order 12345",
    ]
    rows = [(i, f"call {p} now") for i, p in enumerate(positives)] + [
        (100 + i, f"ref {n} end") for i, n in enumerate(negatives)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    for i, p in enumerate(positives):
        assert got[i]["n_phone"] == 1, (p, got[i]["text"])
        assert got[i]["text"] == "call [PHONE] now", (p, got[i]["text"])
    for i, n in enumerate(negatives):
        assert got[100 + i]["n_phone"] == 0, (n, got[100 + i]["text"])
        assert "[PHONE]" not in got[100 + i]["text"], (n, got[100 + i]["text"])
    # SSN gets its own token, and the bare product code survives whole
    ssn = spark.createDataFrame(
        [(0, "ssn 123-45-6789 sku 5551230042")], "doc_id long, text string"
    )
    row = redact_pii(ssn).collect()[0]
    assert row["n_ssn"] == 1 and row["n_phone"] == 0
    assert row["text"] == "ssn [SSN] sku 5551230042"


def test_jsonl_shards_compressed_roundtrip(spark, tmp_path):
    """Compressed JSONL shard trees (the .jsonl.gz / .jsonl.zst shape
    public corpora actually ship) round-trip byte-identically to the
    uncompressed tree, with deterministic shard routing intact and
    the codec genuinely applied (file extensions prove it — a silent
    fall-through to plain text would still 'round-trip')."""
    import glob
    import os

    from coltt_spark.sources.jsonl import read_jsonl, write_jsonl_shards
    from coltt_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(200)
    schema = "doc_id long, text string, shard int"
    plain = str(tmp_path / "plain")
    write_jsonl_shards(docs, plain, id_col="doc_id", n_shards=4)
    want = sorted(
        (r["doc_id"], r["text"], r["shard"])
        for r in read_jsonl(spark, plain, schema).collect()
    )
    # zstd needs the Hadoop native codec, absent in this build —
    # gzip/bzip2 exercise the same option plumbing
    for codec, ext in (("gzip", ".gz"), ("bzip2", ".bz2")):
        path = str(tmp_path / codec)
        write_jsonl_shards(docs, path, id_col="doc_id", n_shards=4, compression=codec)
        files = glob.glob(os.path.join(path, "shard=*", "part-*"))
        assert files and all(f.endswith(ext) for f in files), (codec, files[:3])
        got = sorted(
            (r["doc_id"], r["text"], r["shard"])
            for r in read_jsonl(spark, path, schema).collect()
        )
        assert got == want, codec


def test_archive_shards_roundtrip_unicode_and_routing(spark):
    """Archive export → ingest: zip and tar.gz shards round-trip
    unicode/newline text byte-exactly, member counts match the
    manifest, routing follows hash60(id) % n, and a foreign member
    name in an archive fails loudly (no silently dropped docs)."""
    import io
    import os
    import zipfile

    import pytest

    from coltt_spark.functions.text import hash60
    from coltt_spark.sources.archives import read_archive_docs, write_archive_shards
    from coltt_spark.tmpdirs import scratch_dir

    rows = [
        (0, "plain ascii"),
        (1, "unicode: café 中文 \U0001f600"),
        (2, "embedded\nnewline,\tand \"quotes\""),
        (3, ""),
        (44, "x" * 10_000),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fmt in ("zip", "tar", "warc"):
        path = scratch_dir(prefix=f"coltt_arc_{fmt}_")
        manifest = {
            r["shard"]: r for r in write_archive_shards(
                df, path, id_col="doc_id", n_shards=3, fmt=fmt
            ).collect()
        }
        assert sum(r["members"] for r in manifest.values()) == len(rows)
        back = {r["doc_id"]: r for r in read_archive_docs(spark, path).collect()}
        assert set(back) == {r[0] for r in rows}
        for doc_id, text in rows:
            assert back[doc_id]["text"] == text
            expect_shard = int(
                df.filter(F.col("doc_id") == doc_id)
                .select((hash60(F.col("doc_id").cast("string")) % 3).cast("int"))
                .first()[0]
            )
            assert f"shard-{expect_shard:05d}" in back[doc_id]["archive"]
    # foreign member name → loud failure
    bad = scratch_dir(prefix="coltt_arc_bad_")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("README.md", b"not a doc")
    with open(os.path.join(bad, "shard-00000.zip"), "wb") as fh:
        fh.write(buf.getvalue())
    with pytest.raises(Exception, match="unexpected archive member"):
        read_archive_docs(spark, bad).collect()


def test_archive_read_is_narrow_scan(spark):
    """binaryFile scan → one mapInPandas, zero Exchange: extraction
    parallelism == archive count by construction (the 100 TB ingest
    shape — archives are not splittable)."""
    from coltt_spark.plans.inspect import has_shuffle
    from coltt_spark.sources.archives import read_archive_docs, write_archive_shards
    from coltt_spark.sources.tables import load_table
    from coltt_spark.tmpdirs import scratch_dir

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    path = scratch_dir(prefix="coltt_arc_plan_")
    write_archive_shards(docs, path, id_col="doc_id", n_shards=2).collect()
    back = read_archive_docs(spark, path)
    assert not has_shuffle(back)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1


def test_warc_html_extraction_chain(spark):
    """The crawl-corpus chain: html_page_table fabricates four markup
    flavors, WARC shards carry them as text/html records, and
    read_warc_records → html_extract recovers exactly the local
    scanner's extraction (per flavor), with content-type and uri
    metadata intact — and the read side stays a narrow scan."""
    from coltt_spark.operators.html_text import extract_html_text, html_extract
    from coltt_spark.operators.html_text import html_page_table
    from coltt_spark.plans.inspect import has_shuffle
    from coltt_spark.sources.archives import read_warc_records, write_archive_shards
    from coltt_spark.sources.tables import load_table
    from coltt_spark.tmpdirs import scratch_dir

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(16)
    pages = html_page_table(docs)
    local_html = {r["doc_id"]: r["html"] for r in pages.collect()}
    assert {d % 4 for d in local_html} == {0, 1, 2, 3}  # all flavors present

    path = scratch_dir(prefix="coltt_warc_html_t_")
    write_archive_shards(
        pages, path, id_col="doc_id", text_col="html",
        n_shards=2, fmt="warc", content_type="text/html",
    ).collect()
    recs = read_warc_records(spark, path)
    assert not has_shuffle(recs)
    got = recs.collect()
    assert len(got) == len(local_html)
    assert {r["content_type"] for r in got} == {"text/html"}
    by_id = {int(r["uri"].removeprefix("urn:doc:")): r["payload"] for r in got}
    assert by_id == local_html  # byte-fidelity through the container

    extracted = {
        r["doc_id"]: r["text"]
        for r in html_extract(
            recs.selectExpr(
                "CAST(substr(uri, 9) AS LONG) AS doc_id", "payload AS html"
            )
        ).collect()
    }
    for doc_id, html in local_html.items():
        assert extracted[doc_id] == extract_html_text(html)
        assert extracted[doc_id].startswith(f"Doc {doc_id}\n")
        assert extracted[doc_id].endswith("\nRead more")


def test_dedup_lines_semantics(spark):
    """Line dedup counts DISTINCT DOCUMENTS (a line repeated inside
    one doc is not boilerplate), preserves surviving-line order,
    empties a fully-boilerplate doc to '', and the count columns
    reconcile with the original line counts."""
    from coltt_spark.operators.pipeline import dedup_lines

    rows = [
        (1, "BOILER\nunique one\nBOILER"),   # internal repeat: 1 doc only
        (2, "BOILER\nunique two"),
        (3, "BOILER\nunique three\ntail"),
        (4, "BOILER"),                        # fully boilerplate once freq
        (5, "alpha\nbeta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df, "doc_id", "text").collect()}
    # BOILER appears in docs 1-4 (4 distinct >= 3) -> dropped everywhere,
    # including BOTH internal repeats in doc 1
    assert out[1]["text"] == "unique one" and out[1]["n_removed"] == 2
    assert out[2]["text"] == "unique two"
    assert out[3]["text"] == "unique three\ntail" and out[3]["n_kept"] == 2
    assert out[4]["text"] == "" and out[4]["n_kept"] == 0
    assert out[5]["text"] == "alpha\nbeta" and out[5]["n_removed"] == 0
    for doc_id, text in rows:
        assert out[doc_id]["n_kept"] + out[doc_id]["n_removed"] == len(text.split("\n"))

    # min_docs=5: nothing qualifies, everything survives verbatim
    full = {r["doc_id"]: r["text"] for r in
            dedup_lines(df, "doc_id", "text", min_docs=5).collect()}
    assert full == {d: t for d, t in rows}


def test_warc_response_records_and_http_body(spark):
    """Real Common Crawl WARCs carry `response` records whose payload
    is the FULL HTTP exchange (status line, headers, blank line,
    body). read_warc_records surfaces them verbatim; the http_body
    Catalyst expression strips the header block and passes
    resource-style payloads through untouched."""
    import gzip
    import os

    from coltt_spark.sources.archives import http_body, read_warc_records
    from coltt_spark.tmpdirs import scratch_dir

    html = "<html><body><p>Crawled content.</p></body></html>"
    http = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        "X-Header: v\r\n\r\n" + html
    )

    def rec(rtype, uri, ctype, body: bytes) -> bytes:
        return (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {rtype}\r\n".encode()
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + f"Content-Type: {ctype}\r\n".encode()
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
            + b"\r\n\r\n"
        )

    blob = gzip.compress(
        rec("warcinfo", "", "application/warc-fields", b"software: test\r\n"), mtime=0
    ) + gzip.compress(
        rec(
            "response",
            "http://example.com/page",
            'application/http; msgtype=response',
            http.encode(),
        ),
        mtime=0,
    ) + gzip.compress(
        rec("resource", "urn:doc:7", "text/plain", b"plain body"), mtime=0
    )
    path = scratch_dir(prefix="coltt_cc_warc_")
    with open(os.path.join(path, "shard-00000.warc.gz"), "wb") as fh:
        fh.write(blob)

    rows = {r["uri"]: r for r in read_warc_records(spark, path).collect()}
    assert len(rows) == 3
    assert rows["http://example.com/page"]["payload"] == http

    from pyspark.sql import functions as F

    bodies = {
        r["uri"]: r["body"]
        for r in read_warc_records(spark, path)
        .select("uri", http_body("payload").alias("body"))
        .collect()
    }
    assert bodies["http://example.com/page"] == html  # headers stripped
    assert bodies["urn:doc:7"] == "plain body"  # pass-through


def test_script_lang_id_labels(spark):
    """Script-aware lang-id on hand-built rows: each script band,
    kana-beats-han precedence (Japanese text is majority han), CJK
    punctuation NOT misread as kana (E3 pair-indexing), the Latin
    marker fallback, and empty/short strings (the Spark sequence()
    descending gotcha)."""
    from coltt_spark.operators.textstats import script_lang_id

    rows = [
        (0, "日本語のテキストです"),       # kana の/です + han → ja
        (1, "中文文本处理"),               # han only → zh
        (2, "中文文本、处理。"),           # han + E3 80 punctuation → zh
        (3, "한국어 텍스트"),              # Hangul → ko
        (4, "русский текст"),             # Cyrillic → ru
        (5, "the quick brown fox and the dog"),  # markers → en
        (6, "zzz qqq xxx"),               # Latin, no markers → und
        (7, ""),                          # empty → und
        (8, "a"),  # 1-byte: the sequence guard ("a" IS an en marker)
        (9, "café résumé"),               # Latin-ext (C3) → marker path
        # -- the r9 Latin tier (VERDICT r8 #6), one row each; accented
        # function words (não/więcej/değil) tokenize to shrapnel and
        # must NOT score — only the ASCII-clean markers decide
        (10, "uma casa mais bonita para todos"),        # pt
        (11, "questo libro è anche della scuola"),      # it
        (12, "het weer wordt een mooie dag voor ons"),  # nl
        (13, "jest tak dobre jak nigdy więcej"),        # pl
        (14, "bu şehir daha güzel bir yer gibi"),       # tr
        (15, "buku ini yang terbaik untuk semua"),      # id
        (16, "anh em trong nhà theo nhau cho vui"),     # vi
        # tie goes to the EARLIEST _LANG_ORDER entry: "que" scores
        # es 1 and pt 1 → es, the r1-r8 behavior preserved
        (17, "que"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in script_lang_id(df, "doc_id", "text").collect()
    }
    assert got[0]["pred_lang"] == "ja" and got[0]["n_kana"] > 0
    assert got[1]["pred_lang"] == "zh" and got[1]["n_kana"] == 0
    assert got[2]["pred_lang"] == "zh" and got[2]["n_kana"] == 0  # 、。
    assert got[3]["pred_lang"] == "ko" and got[3]["n_hangul"] > 0
    assert got[4]["pred_lang"] == "ru" and got[4]["n_cyr"] > 0
    assert got[5]["pred_lang"] == "en" and got[5]["marker_hits"] > 0
    assert got[6]["pred_lang"] == "und"
    assert got[7]["pred_lang"] == "und" and got[7]["n_kana"] == 0
    assert got[8]["pred_lang"] == "en" and got[8]["n_kana"] == 0
    assert got[9]["n_cjk"] == 0 and got[9]["n_cyr"] == 0
    assert got[10]["pred_lang"] == "pt" and got[10]["marker_hits"] == 3
    assert got[11]["pred_lang"] == "it" and got[11]["marker_hits"] == 3
    assert got[12]["pred_lang"] == "nl" and got[12]["marker_hits"] == 3
    assert got[13]["pred_lang"] == "pl" and got[13]["marker_hits"] == 3
    assert got[14]["pred_lang"] == "tr" and got[14]["marker_hits"] == 4
    assert got[15]["pred_lang"] == "id" and got[15]["marker_hits"] == 3
    assert got[16]["pred_lang"] == "vi" and got[16]["marker_hits"] == 6
    assert got[17]["pred_lang"] == "es" and got[17]["marker_hits"] == 1


def test_script_lang_id_matches_duckdb_on_adversarial_unicode(spark):
    """Cross-engine contract on ARBITRARY text, not just the fixture
    shapes (the test_urls battery style): a deterministic generator
    mixes every script band, astral-plane chars (4-byte UTF-8 / F0
    leads — in no band), combining marks, NBSP/controls, lone-ish
    edge strings, and marker-word soup; Spark's script_lang_id must
    agree with the DuckDB oracle fragment cell-for-cell."""
    import random

    import duckdb as dd

    from coltt_spark.operators.textstats import script_lang_id
    from coltt_spark.registry_text import _script_lang_oracle

    rng = random.Random(4242)
    pools = [
        "abcdefgh ",                      # ASCII
        "the and of to a in is it ",      # en markers
        "der die und le la el en ",       # de/fr/es markers
        "uma jest yang het bir anh che ",  # r9 Latin-tier markers
        "日本語処理文章",                   # CJK han (E4-E9)
        "のテキストですがを",               # kana (E3 81-83)
        "、。〒〓",                        # CJK punct (E3, NOT kana)
        "한국어텍스트서울",                 # Hangul (EA-ED)
        "русскийтекстабв",                # Cyrillic (D0/D1)
        "àéîõüçñ",                        # Latin-1 supplement (C3)
        "𝄞🎉𠀀",                          # astral (F0 leads)
        "áë",                 # combining marks (CC leads)
        " \t\n ",                    # NBSP + ASCII whitespace
    ]
    texts = ["", " ", "a", " ", "の", "𝄞"]
    for _ in range(200):
        n = rng.randint(1, 6)
        texts.append(
            "".join(
                "".join(rng.choices(rng.choice(pools), k=rng.randint(1, 8)))
                + (" " if rng.random() < 0.5 else "")
                for _ in range(n)
            )
        )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in script_lang_id(df, "doc_id", "text").collect()
    }
    con = dd.connect()
    con.execute("CREATE TABLE fuzz(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO fuzz VALUES (?, ?)", list(enumerate(texts))
    )
    want = {
        r[0]: tuple(r)[1:]
        for r in con.execute(_script_lang_oracle("fuzz")).fetchall()
    }
    assert len(got) == len(want)
    for i in got:
        assert got[i] == want[i], f"{texts[i]!r}: spark={got[i]} duckdb={want[i]}"


def test_script_profile_hand_computed(spark):
    """Known mixed-script string: 'ab é あ 中 한 я 。' — 2 ascii
    letters + 6 ascii spaces, 1 latin-ext (é = C3), 1 kana (あ = E3
    81/82 pair), 1 cjk (中 = E4), 1 hangul (한 = ED), 1 cyrillic
    (я = D1), 1 other (。 = E3 80 — an E3 lead OUTSIDE the kana
    second-byte band) = 14 characters; fractions sum to 1."""
    from coltt_spark.operators.textstats import script_profile

    df = spark.createDataFrame(
        [(1, "ab é あ 中 한 я 。"), (2, ""), (3, "ascii only")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in script_profile(df, "doc_id", "text").collect()}
    r = rows[1]
    assert r["n_chars"] == 14
    assert r["frac_ascii"] == round(8 / 14, 4)
    assert r["frac_latin_ext"] == round(1 / 14, 4)
    assert r["frac_kana"] == round(1 / 14, 4)
    assert r["frac_cjk"] == round(1 / 14, 4)
    assert r["frac_hangul"] == round(1 / 14, 4)
    assert r["frac_cyrillic"] == round(1 / 14, 4)
    assert r["frac_other"] == round(1 / 14, 4)
    fr = [
        r["frac_ascii"], r["frac_latin_ext"], r["frac_cyrillic"],
        r["frac_kana"], r["frac_cjk"], r["frac_hangul"], r["frac_other"],
    ]
    assert abs(sum(fr) - 1.0) < 5e-4  # rounding residue only
    assert rows[2]["n_chars"] == 0 and rows[2]["frac_ascii"] == 0.0
    assert rows[3]["frac_ascii"] == 1.0 and rows[3]["frac_other"] == 0.0


def test_script_profile_matches_duckdb_on_adversarial_unicode(spark):
    """Same fuzz battery for the composition profile: fractions over
    lead-byte classes must agree cell-for-cell with the DuckDB
    fragment on arbitrary mixed-script text (astral F0 leads and
    combining CC leads land in 'other'; whitespace and controls in
    'ascii'; empty strings in the all-zeros row)."""
    import random

    import duckdb as dd

    from coltt_spark.operators.textstats import script_profile
    from coltt_spark.registry_text import _script_profile_oracle

    rng = random.Random(31337)
    pools = [
        "abcdefgh ",
        "日本語処理文章",
        "のテキストですがを",
        "、。〒〓",
        "한국어텍스트서울",
        "русскийтекстабв",
        "àéîõüçñ",
        "𝄞🎉𠀀",
        "áë",
        " \t\n ",
    ]
    texts = ["", " ", "a", "の", "𝄞"]
    for _ in range(150):
        n = rng.randint(1, 6)
        texts.append(
            "".join(
                "".join(rng.choices(rng.choice(pools), k=rng.randint(1, 8)))
                + (" " if rng.random() < 0.5 else "")
                for _ in range(n)
            )
        )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in script_profile(df, "doc_id", "text").collect()
    }
    con = dd.connect()
    con.execute("CREATE TABLE fuzz(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fuzz VALUES (?, ?)", list(enumerate(texts)))
    want = {
        r[0]: tuple(r)[1:]
        for r in con.execute(_script_profile_oracle("fuzz")).fetchall()
    }
    assert len(got) == len(want)
    for i in got:
        assert got[i] == want[i], f"{texts[i]!r}: spark={got[i]} duckdb={want[i]}"


def test_domain_quota_two_phase_equals_single_window(spark):
    """The salted two-phase top-K must be EXACTLY the single-window
    rank (the oracle replays the latter): build a skewed corpus — one
    megadomain with 500 rows, a 4-row domain (smaller than the cap
    spread over every salt, the corner where phase 1 keeps
    everything), a 1-row domain — with duplicate priorities so the
    doc-id tie-break decides, and compare against the naive
    window-rank computed in plain Python."""
    from coltt_spark.operators.pipeline import domain_quota

    rows = []
    for i in range(500):
        rows.append((i, "mega.example.com", (i * 13) % 7))
    for i in range(500, 504):
        rows.append((i, "small.example.org", 5))
    rows.append((900, "one.example.net", 1))
    df = spark.createDataFrame(rows, ["doc_id", "domain", "score"])
    got = {
        (r["doc_id"], r["domain"], r["score"], r["rk"], r["n_domain_docs"])
        for r in domain_quota(
            df, "doc_id", "domain", "score", cap=3, target_partition_rows=50
        ).collect()
    }  # mega fans out to 10 salts; the 4-row and 1-row domains get 1
    # naive single-window reference
    want = set()
    by_dom: dict = {}
    for i, dom, s in rows:
        by_dom.setdefault(dom, []).append((i, s))
    for dom, items in by_dom.items():
        ranked = sorted(items, key=lambda t: (-t[1], t[0]))
        for rk, (i, s) in enumerate(ranked[:3], start=1):
            want.add((i, dom, s, rk, len(items)))
    assert got == want
    # the megadomain is capped at 3 of 500; the 1-row domain survives
    kept_mega = [t for t in got if t[1] == "mega.example.com"]
    assert len(kept_mega) == 3 and all(t[4] == 500 for t in kept_mega)
    assert (900, "one.example.net", 1, 1, 1) in got
    # default dial (2M target): every domain degenerates to salts_d=1
    # — phase 1 IS the exact rank; the result must be identical
    got_default = {
        (r["doc_id"], r["domain"], r["score"], r["rk"], r["n_domain_docs"])
        for r in domain_quota(df, "doc_id", "domain", "score", cap=3).collect()
    }
    assert got_default == want


def test_semantic_decontaminate_flags_planted_leaks(spark):
    """Embedding-space decontamination must flag EXACTLY the planted
    contamination: the benchmark rows appearing verbatim in the
    training corpus and their cosine-invariant scaled copies — both
    at max_cos_sim 1.0 — and nothing else on the md5-random
    embeddings (nothing unrelated sits within cosine 0.95)."""
    from coltt_spark.operators.pipeline import semantic_decontaminate
    from coltt_spark.sources.tables import load_table

    from .conftest import SF_CORRECT

    emb = load_table(spark, SF_CORRECT, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    bench = emb.filter(F.col("vec_id") % 50 == 0)
    copies = bench.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.2)).alias("embedding"),
    )
    train = emb.unionByName(copies)
    rows = {
        int(r["vec_id"]): (r["n_benchmark_hits"], r["max_cos_sim"])
        for r in semantic_decontaminate(
            train, bench, "vec_id", "embedding", threshold=0.95
        ).collect()
    }
    bench_ids = {int(r["vec_id"]) for r in bench.collect()}
    planted = bench_ids | {i + 100000 for i in bench_ids}
    assert set(rows) == planted, set(rows) ^ planted
    for vid, (hits, mc) in rows.items():
        assert hits >= 1 and mc == 1.0, (vid, hits, mc)

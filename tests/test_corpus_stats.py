"""Planted-behavior tests for the corpus-stats operators (line-level
dedup, vocabulary head, unigram-NLL quality) and the URL
canonicalizer — the library surfaces, beyond the registry keys'
DuckDB hash checks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hocr_de_noising_spark.queries.corpus_stats import (
    dedup_repeated_lines,
    unigram_nll,
)
from hocr_de_noising_spark.queries.web_extract import canonicalize_url

BP = "subscribe to our newsletter"


def test_dedup_lines_planted_boilerplate(spark):
    rows = [(i, f"unique line {i} alpha\n{BP}\nunique line {i} beta") for i in range(6)]
    rows.append((6, f"{BP}\n{BP}"))  # all-boilerplate doc must survive empty
    rows.append((7, "only content here"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in dedup_repeated_lines(df, df_cap=2).collect()
    }
    for i in range(6):
        assert out[i]["clean_text"] == f"unique line {i} alpha\nunique line {i} beta"
        assert out[i]["n_lines"] == 3 and out[i]["n_kept"] == 2
    # the all-hot doc keeps its row with an empty text, not a dropped row
    assert out[6]["clean_text"] == "" and out[6]["n_kept"] == 0
    assert out[6]["n_lines"] == 2
    assert out[7]["clean_text"] == "only content here" and out[7]["n_kept"] == 1


def test_dedup_lines_order_preserved(spark):
    # reassembly must restore original line order even though the
    # exploded stream is shuffled by line for the anti-join
    text = "\n".join(f"line number {i} of this doc" for i in range(20))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    (row,) = dedup_repeated_lines(df, df_cap=2).collect()
    assert row["clean_text"] == text and row["n_kept"] == 20


def test_unigram_nll_hand_computed(spark):
    # corpus: a a a b  ->  p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame([(0, "a a a"), (1, "b")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_nll(df).collect()}
    assert out[0]["n_tokens"] == 3 and out[1]["n_tokens"] == 1
    assert abs(out[0]["nll"] - (-math.log(0.75))) < 1e-4
    assert abs(out[1]["nll"] - (-math.log(0.25))) < 1e-4


def test_unigram_nll_topv_oov_floor(spark):
    # top_v=1 keeps only 'a'; 'b' scores the OOV floor
    df = spark.createDataFrame([(0, "a a a"), (1, "b")], ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in unigram_nll(df, top_v=1, oov_floor=1e-6).collect()
    }
    assert abs(out[1]["nll"] - (-math.log(1e-6))) < 1e-4
    assert abs(out[0]["nll"] - (-math.log(0.75))) < 1e-4


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], ["url"])
    return df.select(canonicalize_url(F.col("url")).alias("c")).first()["c"]


def test_canonicalize_url_variants(spark):
    # case + default port + tracking params + fragment + trailing slash
    assert (
        _canon(spark, "HTTPS://WWW.Example.COM:443/Path/9/?utm_source=f&id=3#top")
        == "https://example.com/Path/9?id=3"
    )
    # http default port, utm anywhere in the query, params sorted
    assert (
        _canon(spark, "http://example.com:80/p?z=1&utm_campaign=x&a=2")
        == "http://example.com/p?a=2&z=1"
    )
    # NON-default port must be kept; www stripped only as a prefix
    assert (
        _canon(spark, "https://sub.Example.com:8443/path/2/")
        == "https://sub.example.com:8443/path/2"
    )
    # bare host, no path/query
    assert _canon(spark, "https://Example.com/") == "https://example.com"
    # query-only utm params -> no '?' at all
    assert (
        _canon(spark, "https://a.com/x?utm_medium=em") == "https://a.com/x"
    )


def test_sample_stratified_fracs(spark):
    from hocr_de_noising_spark.queries.corpus_stats import sample_stratified

    rows = [(i, "a" if i < 2000 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = sample_stratified(df, {"a": 0.5, "b": 1.0}).groupBy("source").count()
    counts = {r["source"]: r["count"] for r in kept.collect()}
    # frac=1.0 keeps EVERY row (the 'g' sentinel — a 5-hex-digit
    # threshold would lexicographically keep almost nothing)
    assert counts["b"] == 2000
    assert abs(counts["a"] - 1000) < 100  # ~50% of 2000
    # frac=0 strata and the default_frac=0 fallback keep nothing
    none = sample_stratified(df, {"a": 0.0}).filter("source = 'a'").count()
    assert none == 0
    assert sample_stratified(df, {}).count() == 0
    # a different salt draws an independent sample of the same size
    s1 = {r["doc_id"] for r in sample_stratified(df, {"a": 0.5}).collect()}
    s2 = {
        r["doc_id"]
        for r in sample_stratified(df, {"a": 0.5}, salt="x").collect()
    }
    assert s1 != s2 and abs(len(s2) - 1000) < 100


def test_bpe_pair_edge_cases(spark, tmp_path):
    # single-token and empty docs contribute no pairs; counts are
    # corpus-wide occurrence counts (not per-doc distinct)
    sdir = tmp_path / "bpe"
    sdir.mkdir()
    spark.createDataFrame(
        [(0, "lo w lo w", "en", "s", 9), (1, "lo", "en", "s", 2),
         (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(sdir / "documents.parquet"))
    from hocr_de_noising_spark.queries import QUERIES

    got = {
        r["pair"]: r["n"]
        for r in QUERIES["bpe_pair_topk"]["fn"](spark, str(sdir)).collect()
    }
    assert got == {"lo w": 2, "w lo": 1}


def test_shard_token_budget_exact_and_bucket_invariant(spark):
    from hocr_de_noising_spark.queries.corpus_stats import shard_token_budget

    # token counts 3,5,4,6,2,8 at budget 10: exclusive prefix sums
    # 0,3,8,12,18,20 -> shards 0,0,0,1,1,2
    rows = [(i, " ".join(["t"] * n)) for i, n in enumerate([3, 5, 4, 6, 2, 8])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["shard"]
        for r in shard_token_budget(df, 10, bucket_width=2).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2}
    # the distributed prefix sum is bucket-width-invariant: any width
    # gives the same shards as one global bucket
    wide = {
        r["doc_id"]: r["shard"]
        for r in shard_token_budget(df, 10, bucket_width=1 << 20).collect()
    }
    assert wide == got


def test_pack_sequences_hand_computed(spark):
    from hocr_de_noising_spark.queries.corpus_stats import pack_sequences

    # token counts 3,5,4,6 at L=4: cursor 0,3,8,12 -> doc0 fills seq0
    # [0,3); doc1 straddles seq0 (1 token) + seq1 (4); doc2 exactly
    # fills seq2; doc3 spans seq3 (4) + seq4 (2)
    rows = [(i, " ".join(["t"] * n)) for i, n in enumerate([3, 5, 4, 6])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r["seq_id"], r["doc_id"], r["doc_offset"], r["n_tokens"])
        for r in pack_sequences(df, 4, bucket_width=2).collect()
    )
    assert got == [
        (0, 0, 0, 3),
        (0, 1, 0, 1),
        (1, 1, 1, 4),
        (2, 2, 0, 4),
        (3, 3, 0, 4),
        (4, 3, 4, 2),
    ]


def test_pack_sequences_invariants(spark):
    from hocr_de_noising_spark.queries.corpus_stats import pack_sequences

    import random

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"w{j}" for j in range(rng.randint(1, 40))))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_sequences(df, 16, bucket_width=8).collect()
    # per-doc contributions reassemble the doc exactly, in offset order
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in rows:
        segs = sorted(by_doc[i], key=lambda r: r["doc_offset"])
        n = len(text.split(" "))
        assert segs[0]["doc_offset"] == 0
        assert sum(s["n_tokens"] for s in segs) == n
        for a, b in zip(segs, segs[1:]):
            assert b["doc_offset"] == a["doc_offset"] + a["n_tokens"]
    # every sequence except the last holds exactly L tokens
    by_seq: dict[int, int] = {}
    for r in out:
        by_seq[r["seq_id"]] = by_seq.get(r["seq_id"], 0) + r["n_tokens"]
    last = max(by_seq)
    assert set(by_seq) == set(range(last + 1))  # no gaps
    for s, n in by_seq.items():
        assert n == 16 or s == last
    # bucket-width invariance of the distributed prefix sum
    wide = sorted(map(tuple, pack_sequences(df, 16, bucket_width=1 << 20).collect()))
    assert wide == sorted(map(tuple, out))


def test_dsir_planted_target_affinity(spark):
    from hocr_de_noising_spark.queries.corpus_stats import dsir_importance

    target = spark.createDataFrame(
        [(1000 + i, "quantum physics research on entangled photon states")
         for i in range(5)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [(0, "quantum physics research on photon detectors"),
         (1, "entangled states of quantum systems"),
         (2, "buy cheap pills online casino bonus now"),
         (3, "click here free casino spins winner prize")],
        ["doc_id", "text"],
    )
    scores = {
        r["doc_id"]: r["score"]
        for r in dsir_importance(raw, target).collect()
    }
    # every target-like doc outranks every junk doc
    assert min(scores[0], scores[1]) > max(scores[2], scores[3])
    # top_k keeps the highest-scoring docs
    kept = {r["doc_id"] for r in dsir_importance(raw, target, top_k=2).collect()}
    assert kept == {0, 1}


def test_dsir_fast_hash_same_separation(spark):
    # fast_hash swaps md5 for xxhash64 bucketing: individual scores
    # differ (different collisions) but the planted target/junk
    # separation must hold under either featurization
    from hocr_de_noising_spark.queries.corpus_stats import dsir_importance

    target = spark.createDataFrame(
        [(1000 + i, "quantum physics research on entangled photon states")
         for i in range(5)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [(0, "quantum physics research on photon detectors"),
         (1, "entangled states of quantum systems"),
         (2, "buy cheap pills online casino bonus now"),
         (3, "click here free casino spins winner prize")],
        ["doc_id", "text"],
    )
    scores = {
        r["doc_id"]: r["score"]
        for r in dsir_importance(raw, target, fast_hash=True).collect()
    }
    assert min(scores[0], scores[1]) > max(scores[2], scores[3])


def test_dsir_empty_target_no_crash(spark):
    from hocr_de_noising_spark.queries.corpus_stats import dsir_importance

    raw = spark.createDataFrame([(0, "some words here")], ["doc_id", "text"])
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = dsir_importance(raw, empty).collect()
    # uniform-smoothed target: scoring still runs, one row per raw doc
    assert len(out) == 1 and out[0]["n_feats"] == 5


def test_host_blocklist_suffix_semantics(spark):
    from hocr_de_noising_spark.queries.web_extract import (
        filter_blocked_hosts,
    )

    hosts = [
        ("ads.example.com", True, "example.com"),   # subdomain blocked
        ("example.com", True, "example.com"),       # exact host blocked
        ("notexample.com", False, None),            # NO dot boundary
        ("example.com.evil.org", False, None),      # suffix only, not infix
        ("deep.a.b.example.com", True, "example.com"),
        ("exact.only.net", True, "exact.only.net"), # full-host entry
        ("sub.exact.only.net", True, "exact.only.net"),
        ("com", False, None),
    ]
    df = spark.createDataFrame(
        [(h,) for h, _, _ in hosts], "host string"
    )
    out = {
        r["host"]: r
        for r in filter_blocked_hosts(
            df, "host", blocklist=("example.com", "exact.only.net")
        ).collect()
    }
    for h, blocked, rule in hosts:
        assert out[h]["blocked"] == blocked, h
        assert out[h]["block_rule"] == rule, h


def test_host_blocklist_plan_map_side_only(spark, sf001_dir):
    from hocr_de_noising_spark.queries import QUERIES

    df = QUERIES["url_host_filter"]["fn"](spark, sf001_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p  # literal-blocklist path: zero shuffle
    assert "Python" not in p


def test_host_blocklist_join_path_agrees_with_literal(spark):
    from hocr_de_noising_spark.queries.web_extract import (
        filter_blocked_hosts,
        filter_blocked_hosts_join,
    )

    bl = ("example.com", "ads.example.com", "exact.only.net")
    hosts = [
        "ads.example.com",      # TWO entries match -> longest wins
        "x.ads.example.com",
        "example.com",
        "notexample.com",
        "sub.exact.only.net",
        "com",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    lit = {
        r["host"]: (r["blocked"], r["block_rule"])
        for r in filter_blocked_hosts(df, "host", blocklist=bl).collect()
    }
    bdf = spark.createDataFrame([(e,) for e in bl], "entry string")
    join = {
        r["host"]: (r["blocked"], r["block_rule"])
        for r in filter_blocked_hosts_join(df, bdf, "host").collect()
    }
    assert lit == join
    assert lit["ads.example.com"] == (True, "ads.example.com")
    assert lit["x.ads.example.com"] == (True, "ads.example.com")


def test_pack_sequences_matches_python_reference(spark):
    # randomized differential: the distributed manifest must equal an
    # independent single-pass Python packer on 80 seeded random docs
    import random

    from hocr_de_noising_spark.queries.corpus_stats import pack_sequences

    rng = random.Random(99)
    rows = [
        (i, " ".join("w" * rng.randint(1, 3) for _ in range(rng.randint(1, 70))))
        for i in range(80)
    ]
    L = 13

    def ref():
        out, cum = [], 0
        for i, t in rows:
            n = len(t.split(" "))
            off = 0
            while off < n:
                seq = (cum + off) // L
                take = min(n - off, (seq + 1) * L - (cum + off))
                out.append((seq, i, off, take))
                off += take
            cum += n
        return sorted(out)

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r["seq_id"], r["doc_id"], r["doc_offset"], r["n_tokens"])
        for r in pack_sequences(df, L, bucket_width=7).collect()
    )
    assert got == ref()

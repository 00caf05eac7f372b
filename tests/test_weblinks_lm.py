"""URL canonicalization / domain ops (operators/weblinks.py) and
corpus-LM operators (operators/lm.py): unit semantics vs hand-computed
references, plan shape (codegen / single-shuffle claims), and the
blocklist anti-join."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphiti_spark.functions.smalldf import literal_df
from graphiti_spark.operators import lm as L
from graphiti_spark.operators import weblinks as W


def _canon(spark, url: str) -> str:
    df = literal_df(spark, [(url,)], [("url", "string")])
    return df.select(W.canonicalize_url(F.col("url")).alias("c")).first()["c"]


CANON_CASES = [
    # case + fragment + tracking + param order + www + default port
    ("https://site.com/a?b=2&a=1", "https://site.com/a?a=1&b=2"),
    ("HTTPS://WWW.Site.COM/a?b=2&a=1#frag", "https://site.com/a?a=1&b=2"),
    ("https://site.com:443/a/?utm_source=x&a=1&b=2", "https://site.com/a?a=1&b=2"),
    ("http://site.com:80/a?gclid=z&fbclid=y&a=1", "http://site.com/a?a=1"),
    # :80 is NOT default for https (and vice versa) — kept
    ("https://site.com:80/a", "https://site.com:80/a"),
    ("http://site.com:443/a", "http://site.com:443/a"),
    # bare host → '/', trailing slash runs collapse
    ("https://site.com", "https://site.com/"),
    ("https://site.com///", "https://site.com/"),
    # all params tracking → no '?'
    ("https://site.com/a?utm_campaign=c&ref=r", "https://site.com/a"),
    # non-URL rows pass through lowercased (observable, not dropped)
    ("Not A Url", "not a url"),
]


@pytest.mark.parametrize("url,expected", CANON_CASES)
def test_canonicalize_url_cases(spark, url, expected):
    assert _canon(spark, url) == expected


REG_CASES = [
    ("news.site2.co.uk", "site2.co.uk"),
    ("a.b.site.ac.uk", "site.ac.uk"),
    ("x.y.site.com", "site.com"),
    ("site.io", "site.io"),
    ("localhost", "localhost"),
    ("co.uk", "co.uk"),  # 2 labels: the host itself, never out-of-range
]


@pytest.mark.parametrize("host,expected", REG_CASES)
def test_registered_domain_cases(spark, host, expected):
    df = literal_df(spark, [(host,)], [("host", "string")])
    got = df.select(W.registered_domain(F.col("host")).alias("d")).first()["d"]
    assert got == expected


def test_canonicalize_is_shuffle_free(spark):
    """The canonicalizer must run inside the scan stage: pure codegen,
    no Exchange, no Python workers."""
    df = literal_df(spark, [("https://a.com/x?b=1",)], [("url", "string")])
    plan = df.select(
        W.canonicalize_url(F.col("url")).alias("c")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def _links(spark, rows):
    return literal_df(
        spark,
        rows,
        [("doc_id", "bigint"), ("url", "string"), ("fetch_ts", "timestamp")],
    )


def test_url_dedup_winner_and_counts(spark):
    links = _links(
        spark,
        [
            # three surface variants of one canonical; the ts tie between
            # 7 and 9 must break on min doc_id
            (9, "https://a.com/x?b=1", "2024-01-01 00:00:05"),
            (7, "HTTPS://WWW.A.com/x?b=1#f", "2024-01-01 00:00:05"),
            (8, "https://a.com:443/x/?utm_source=s&b=1", "2024-01-01 00:00:09"),
            (3, "https://b.org/y", "2024-01-02 00:00:00"),
        ],
    )
    out = {r["url_canon"]: r for r in W.url_dedup(links).collect()}
    a = out["https://a.com/x?b=1"]
    assert a["n_fetches"] == 3
    assert a["winner_id"] == 7
    assert str(a["first_ts"]).startswith("2024-01-01 00:00:05")
    assert out["https://b.org/y"]["n_fetches"] == 1


def test_url_dedup_single_exchange_with_partial_agg(spark):
    """One key shuffle; the min(struct)/count combine map-side."""
    links = _links(spark, [(1, "https://a.com/x", "2024-01-01 00:00:00")])
    plan = (
        W.url_dedup(links)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2  # hashpartitioning (+AQE read)
    assert "partial_min" in plan or "partial" in plan.lower()


def test_domain_filter_blocks_exact_domains(spark):
    links = _links(
        spark,
        [
            (1, "https://news.bad.co.uk/x", "2024-01-01 00:00:00"),
            (2, "https://good.com/x", "2024-01-01 00:00:00"),
            (3, "https://sub.good.com/y", "2024-01-01 00:00:00"),
            (4, "https://bad.co.uk/z", "2024-01-01 00:00:00"),
        ],
    )
    kept = W.domain_filter(links, ["bad.co.uk"]).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [2, 3]


def _pages(spark, rows):
    return literal_df(
        spark,
        rows,
        [("doc_id", "bigint"), ("url", "string"), ("html", "string")],
    )


def test_extract_links_resolution_rules(spark):
    """Absolute kept as-is (canonicalized), protocol-relative inherits
    the base scheme, root-relative inherits scheme+host (from the
    CANONICAL base — messy crawl URLs resolve correctly), and
    mailto:/javascript:/fragment/path-relative/single-quoted are
    dropped."""
    html = (
        '<a href="https://Other.COM/x?utm_source=t&k=1">a</a>'
        '<a href="//cdn.site.org/lib.js">b</a>'
        '<a href="/art/9">c</a>'
        '<a href="mailto:x@y.z">d</a>'
        '<a href="javascript:void(0)">e</a>'
        '<a href="#top">f</a>'
        '<a href="rel/path.html">g</a>'
        "<a href='/squoted'>h</a>"
    )
    pages = _pages(
        spark, [(1, "HTTPS://WWW.Base.COM:443/dir/page?x=1#f", html)]
    )
    got = sorted(
        (r["src"], r["dst"])
        for r in W.extract_links(pages).collect()
    )
    assert got == [
        ("https://base.com/dir/page?x=1", "https://base.com/art/9"),
        ("https://base.com/dir/page?x=1", "https://cdn.site.org/lib.js"),
        ("https://base.com/dir/page?x=1", "https://other.com/x?k=1"),
    ]


def test_extract_links_is_shuffle_free(spark):
    """Extraction + resolution + canonicalization compile into the scan
    stage: no Exchange, no Python workers."""
    pages = _pages(spark, [(1, "https://a.com/x", '<a href="/y">y</a>')])
    plan = W.extract_links(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_host_graph_weights_and_self_loops(spark):
    pages = _pages(
        spark,
        [
            (1, "https://a.com/1", '<a href="/s">s</a><a href="//b.com/x">b</a>'),
            (2, "https://a.com/2", '<a href="//b.com/y">b</a>'),
        ],
    )
    hg = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in W.host_graph(W.extract_links(pages)).collect()
    }
    assert hg == {("a.com", "a.com"): 1, ("a.com", "b.com"): 2}


# ---------------------------------------------------------------- lm --


def _docs(spark, rows):
    return literal_df(spark, rows, [("doc_id", "bigint"), ("text", "string")])


def _ref_perplexity(ref_texts, texts, alpha=L.ALPHA):
    """Pure-python twin of train_bigram_lm + perplexity."""
    big: dict[tuple, int] = {}
    pref: dict[str, int] = {}
    vocab = set()
    for t in ref_texts:
        toks = t.lower().strip().split()
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            pref[a] = pref.get(a, 0) + 1
    v = len(vocab)
    out = []
    for t in texts:
        toks = t.lower().strip().split()
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            out.append((0, None))
            continue
        lp = sum(
            math.log(
                (big.get(p, 0) + alpha) / (pref.get(p[0], 0) + alpha * v)
            )
            for p in pairs
        )
        out.append((len(pairs), round(math.exp(-lp / len(pairs)), 4)))
    return out


def test_perplexity_matches_reference_model(spark):
    ref = ["the cat sat on the mat", "the dog sat on the rug"]
    score = [
        "the cat sat on the rug",  # in-distribution
        "quantum flux harmonics resonate",  # fully unseen
        "single",  # <2 tokens → n_bigrams 0, ppl NULL
    ]
    ref_df = _docs(spark, [(i, t) for i, t in enumerate(ref)])
    score_df = _docs(spark, [(i, t) for i, t in enumerate(score)])
    model = L.train_bigram_lm(ref_df)
    got = {
        r["id"]: (r["n_bigrams"], r["ppl"])
        for r in L.perplexity(score_df, model).collect()
    }
    expected = _ref_perplexity(ref, score)
    for i, (n, ppl) in enumerate(expected):
        assert got[i][0] == n
        if ppl is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == pytest.approx(ppl, abs=1e-4)
    # unseen prefix+continuation degrades to uniform 1/V ⇒ ppl == V
    v = len(set(" ".join(ref).split()))
    assert got[1][1] == pytest.approx(v, abs=1e-3)
    # in-distribution text scores far below the uniform ceiling
    assert got[0][1] < v / 2


def test_dsir_weights_prefer_target_like_docs(spark):
    target_rows = [(i, "alpha beta gamma delta") for i in range(8)]
    raw_rows = target_rows[:4] + [
        (10 + i, "zeta eta theta iota") for i in range(4)
    ]
    raw = _docs(spark, raw_rows)
    target = _docs(spark, target_rows)
    got = {r["id"]: r["logw"] for r in L.dsir_weights(raw, target).collect()}
    # docs sharing the target's features must outweigh the off-target docs
    assert min(got[i] for i in range(4)) > max(got[10 + i] for i in range(4))


def test_dsir_zero_feature_doc_gets_zero_weight(spark):
    raw = _docs(spark, [(1, "a b"), (2, "")])
    target = _docs(spark, [(1, "a b")])
    got = {r["id"]: r for r in L.dsir_weights(raw, target).collect()}
    assert got[2]["logw"] == pytest.approx(0.0)


def test_dsir_model_tables_are_bucket_bounded(spark):
    """The DSIR model is exactly n_buckets rows regardless of corpus
    size — the broadcastability claim."""
    docs = _docs(spark, [(i, f"tok{i} tok{i + 1}") for i in range(20)])
    probs = L.dsir_bucket_probs(docs, n_buckets=16)
    assert probs.count() == 16


def test_tfidf_keywords_hand_check(spark):
    from graphiti_spark.operators.textstats import tfidf_keywords

    docs = _docs(
        spark,
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
    )
    out = tfidf_keywords(docs, k=2).collect()
    got = {(r["id"], r["rank"]): (r["term"], r["score"]) for r in out}
    # doc 1: apple tf=2 df=1 → 2·ln(3); banana tf=1 df=2 → ln(1.5)
    assert got[(1, 1)][0] == "apple"
    assert got[(1, 1)][1] == pytest.approx(round(2 * math.log(3.0), 4))
    assert got[(1, 2)][0] == "banana"
    # doc 3: cherry tf=3 df=2 → 3·ln(1.5); durian tf=1 df=1 → ln(3)
    assert got[(3, 1)][0] == "cherry"
    # every doc yields at most k rows
    assert max(r["rank"] for r in out) <= 2


# ------------------------------------------------------------- walks --


def _edges(spark, pairs):
    return literal_df(
        spark, pairs, [("src", "bigint"), ("dst", "bigint")]
    )


def test_random_walks_follow_edges_and_truncate(spark):
    from graphiti_spark.operators.walks import random_walks

    # 1→{2,3}, 2→3; 3 is a dead end (walks through it truncate)
    edges = _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 2)])  # multi-edge
    out = random_walks(edges, walk_len=3, walks_per_node=2).collect()
    eset = {(1, 2), (1, 3), (2, 3)}
    # walks start at every node WITH out-edges (1 and 2), 2 each
    assert sorted((r["start"], r["widx"]) for r in out) == [
        (1, 0), (1, 1), (2, 0), (2, 1),
    ]
    for r in out:
        path = r["path"]
        assert path[0] == r["start"]
        assert len(path) <= 4
        for a, b in zip(path, path[1:]):
            assert (a, b) in eset  # every hop is a real (distinct) edge
        assert path[-1] == 3  # all roads end at the only sink


def test_random_walks_deterministic_and_seed_sensitive(spark):
    from graphiti_spark.operators.walks import random_walks

    edges = _edges(
        spark, [(i, j) for i in range(6) for j in range(6) if i != j]
    )
    a = sorted(map(str, random_walks(edges, 4, 2, seed="s1").collect()))
    b = sorted(map(str, random_walks(edges, 4, 2, seed="s1").collect()))
    c = sorted(map(str, random_walks(edges, 4, 2, seed="s2").collect()))
    assert a == b  # pure function of (graph, seed)
    assert a != c  # the seed actually enters the choice


def test_skipgram_pairs_hand_check_and_plan(spark):
    from graphiti_spark.operators.walks import skipgram_pairs

    walks = literal_df(
        spark,
        [(1, 0, [10, 20, 30, 40])],
        [("start", "bigint"), ("widx", "int"), ("path", "array<bigint>")],
    )
    out = skipgram_pairs(walks, window=2)
    got = sorted((r["pos"], r["center"], r["context"]) for r in out.collect())
    expected = sorted(
        (i, p[i], p[j])
        for p in [[10, 20, 30, 40]]
        for i in range(4)
        for j in range(4)
        if i != j and abs(i - j) <= 2
    )
    assert got == expected
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure explode+slice, no self-join


def test_canonicalize_idempotent_combinatorial(spark):
    """canon(canon(u)) == canon(u) over the cross product of surface
    variations — the replay/resume identity contract (a second pass
    over already-canonical URLs must be a no-op)."""
    import itertools

    schemes = ["https://", "HTTP://"]
    hosts = ["www.A.com", "b.co.uk:443", "c.io:80", "d.net"]
    paths = ["", "/", "/x/y/", "/x"]
    queries = ["", "?b=2&a=1", "?utm_source=s&a=1", "?ref=r"]
    frags = ["", "#f"]
    urls = [
        ("".join(parts),)
        for parts in itertools.product(schemes, hosts, paths, queries, frags)
    ]
    df = literal_df(spark, urls, [("url", "string")])
    once = df.select(W.canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select(
        "c1", W.canonicalize_url(F.col("c1")).alias("c2")
    )
    bad = twice.filter(F.col("c1") != F.col("c2")).collect()
    assert bad == [], bad


def _biased_walks_python_twin(
    pairs, walk_len, walks_per_node, ret_w, near_w, far_w, seed
):
    """Pure-python re-derivation of walks.biased_walks: same sha
    uniform, same rank order, same integer weighted inverse-CDF."""
    import hashlib

    eset = sorted(set(pairs))
    adj = {}
    for s, d in eset:
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s].sort()

    def u(start, widx, step):
        h = hashlib.sha256(f"{seed}:{start}:{widx}:{step}".encode())
        return int(h.hexdigest()[:13], 16) / 2**52

    out = []
    for start in sorted(adj):
        for widx in range(walks_per_node):
            path, prev, cur = [start], None, start
            # step 1: uniform
            nbrs = adj.get(cur, [])
            if nbrs:
                prev, cur = cur, nbrs[int(u(start, widx, 1) * len(nbrs))]
                path.append(cur)
            else:
                prev, cur = cur, None
            for step in range(2, walk_len + 1):
                nbrs = adj.get(cur, []) if cur is not None else []
                if not nbrs:
                    prev, cur = cur, None
                    continue
                ws = [
                    ret_w
                    if c == prev
                    else (near_w if (prev, c) in set(eset) else far_w)
                    for c in nbrs
                ]
                t = int(u(start, widx, step) * sum(ws))
                acc = 0
                for c, w in zip(nbrs, ws):
                    acc += w
                    if t < acc:
                        prev, cur = cur, c
                        path.append(c)
                        break
            out.append((start, widx, tuple(path)))
    return sorted(out)


def test_biased_walks_exact_python_twin(spark):
    """Every biased walk must equal the pure-python node2vec twin —
    including dead-end truncation and the distance-1 (near) weighting."""
    from graphiti_spark.operators.walks import biased_walks

    # mixed graph: a triangle (1,2,3 bidirected), a spur 3→4 (dead
    # end), and a hub 5 connected into the triangle one-way
    pairs = [
        (1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3),
        (3, 4), (5, 1), (5, 2), (5, 3),
    ]
    got = sorted(
        (r["start"], r["widx"], tuple(r["path"]))
        for r in biased_walks(
            _edges(spark, pairs),
            walk_len=4,
            walks_per_node=3,
            ret_w=4,
            near_w=2,
            far_w=1,
            seed="tw",
        ).collect()
    )
    want = _biased_walks_python_twin(pairs, 4, 3, 4, 2, 1, "tw")
    assert got == want


def test_biased_walks_return_bias_dominates(spark):
    """With ret_w >> others on a bidirected path graph, step 2 must
    return to the start whenever the uniform first step moved (the
    return interval covers ~all of the weight axis)."""
    from graphiti_spark.operators.walks import biased_walks

    # bidirected 3-path: 1-2-3 (deg(2)=2, deg(1)=deg(3)=1)
    pairs = [(1, 2), (2, 1), (2, 3), (3, 2)]
    out = biased_walks(
        _edges(spark, pairs),
        walk_len=2,
        walks_per_node=4,
        ret_w=10**6,
        near_w=1,
        far_w=1,
        seed="rb",
    ).collect()
    assert len(out) == 12
    for r in out:
        p = r["path"]
        assert len(p) == 3
        # u < 1 - 1/1e6 for every draw here, so the pick always lands
        # in the return interval: path[2] == path[0]
        assert p[2] == p[0], p


def test_negative_samples_exact_python_twin(spark):
    """Every draw must equal the pure-python inverse-CDF twin (same
    sha-uniform, same integer arithmetic) — and each pair gets exactly
    k negatives (every target lands in exactly one interval)."""
    import hashlib

    from graphiti_spark.operators.walks import negative_samples

    pairs = literal_df(
        spark,
        [(1, 0, 0, 10, 20), (1, 0, 1, 20, 10), (2, 1, 0, 30, 10)],
        [
            ("start", "bigint"),
            ("widx", "int"),
            ("pos", "int"),
            ("center", "bigint"),
            ("context", "bigint"),
        ],
    )
    freqs = literal_df(
        spark,
        [(10, 1), (20, 3), (30, 6)],
        [("node", "bigint"), ("cnt", "bigint")],
    )
    k = 3
    out = negative_samples(pairs, freqs, k=k).collect()
    assert len(out) == 3 * k

    # python twin
    cum, acc = {}, 0
    for node, cnt in [(10, 1), (20, 3), (30, 6)]:
        cum[node] = (acc, acc + cnt)
        acc += cnt

    def expected(start, widx, pos, context, j):
        s = f"neg:{start}:{widx}:{pos}:{context}:{j}"
        u = int(hashlib.sha256(s.encode()).hexdigest()[:13], 16) / 2**52
        t = int(u * acc)
        return next(n for n, (lo, hi) in cum.items() if lo <= t < hi)

    for r in out:
        want = expected(
            r["start"], r["widx"], r["pos"], r["context"], r["neg_idx"]
        )
        assert r["negative"] == want, (dict(r.asDict()), want)


def test_extract_anchor_texts_normalizes_and_drops_noise(spark):
    """Same dst set as extract_links; anchor text is lower/trimmed,
    empty bodies become NULL (edge kept), noise hrefs dropped."""
    html = (
        '<a href="https://Other.COM/x?utm_source=t&k=1"> NeXt Page </a>'
        '<a href="//cdn.site.org/lib.js"></a>'
        '<a href="/art/9" class="b">Related</a>'
        '<a href="mailto:x@y.z">mail me</a>'
        '<a href="#top">top</a>'
    )
    pages = _pages(
        spark, [(1, "HTTPS://WWW.Base.COM:443/dir/page?x=1#f", html)]
    )
    got = sorted(
        (r["dst"], r["anchor"])
        for r in W.extract_anchor_texts(pages).collect()
    )
    assert got == [
        ("https://base.com/art/9", "related"),
        ("https://cdn.site.org/lib.js", None),
        ("https://other.com/x?k=1", "next page"),
    ]


def test_extract_anchor_texts_is_shuffle_free(spark):
    pages = _pages(spark, [(1, "https://a.com/x", '<a href="/y">y</a>')])
    plan = (
        W.extract_anchor_texts(pages)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_anchor_text_profile_counts_and_caps(spark):
    """n_refs counts edges (incl. NULL-text), n_srcs distinct sources,
    texts = sorted distinct '|'-joined, capped at max_texts by
    lexicographic-first-k; all-NULL targets get NULL texts."""
    rows = [
        # 5 distinct texts at dst /t from two sources + one NULL-text ref
        (1, "https://s1.com/a", '<a href="https://d.com/t">b</a>'
            '<a href="https://d.com/t">a</a><a href="https://d.com/t">c</a>'),
        (2, "https://s2.com/a", '<a href="https://d.com/t">e</a>'
            '<a href="https://d.com/t">d</a><a href="https://d.com/t"></a>'),
        # a dst whose only anchor is empty-bodied
        (3, "https://s3.com/a", '<a href="https://d.com/bare"></a>'),
    ]
    prof = {
        r["dst"]: r
        for r in W.anchor_text_profile(
            W.extract_anchor_texts(_pages(spark, rows)), max_texts=3
        ).collect()
    }
    t = prof["https://d.com/t"]
    assert (t["n_refs"], t["n_srcs"]) == (6, 2)
    assert t["texts"] == "a|b|c"  # lexicographic first 3 of a..e
    bare = prof["https://d.com/bare"]
    assert (bare["n_refs"], bare["n_srcs"], bare["texts"]) == (1, 1, None)


def test_snapshot_diff_statuses_and_refetch(spark):
    """snapshot_diff partitions the URL universe into exactly
    new/gone/changed/unchanged by content sha, and refetch_set is the
    new+changed subset a recrawl must re-process."""
    from graphiti_spark.functions.smalldf import literal_df
    from graphiti_spark.operators.weblinks import refetch_set, snapshot_diff

    cols = [("url_canon", "string"), ("content_sha", "string")]
    prev = literal_df(
        spark,
        [("https://a/1", "x"), ("https://b/2", "y"), ("https://c/3", "z")],
        cols,
    )
    curr = literal_df(
        spark,
        [("https://b/2", "y"), ("https://c/3", "w"), ("https://d/4", "v")],
        cols,
    )
    diff = snapshot_diff(prev, curr)
    got = {r["url_canon"]: r for r in diff.collect()}
    assert {u: r["status"] for u, r in got.items()} == {
        "https://a/1": "gone",
        "https://b/2": "unchanged",
        "https://c/3": "changed",
        "https://d/4": "new",
    }
    # shas travel with the row: gone keeps prev only, new keeps curr only
    assert got["https://a/1"]["prev_sha"] == "x"
    assert got["https://a/1"]["curr_sha"] is None
    assert got["https://d/4"]["prev_sha"] is None
    assert got["https://d/4"]["curr_sha"] == "v"
    assert got["https://c/3"]["prev_sha"] == "z"
    assert got["https://c/3"]["curr_sha"] == "w"

    refetch = {r["url_canon"] for r in refetch_set(diff).collect()}
    assert refetch == {"https://c/3", "https://d/4"}


def test_recrawl_diff_maintains_dedup_state(spark):
    """Recrawl maintenance law: applying a snapshot diff to the standing
    dedup state — remove_docs on gone+changed ids, then
    update_dedup_state on the refetch set's current texts — must equal
    init_dedup_state over the current snapshot alone. This is the
    integration the snapshot_diff docstring promises: the diff IS the
    incremental workload, including the near-dup case where a refetched
    doc joins an existing cluster. Doc ids are xxhash64(url) — the
    state machinery keys on longs; a URL-addressed corpus derives them."""
    from graphiti_spark.operators.dedup_state import (
        init_dedup_state,
        remove_docs,
        update_dedup_state,
    )

    t = " ".join(f"t{i}" for i in range(1, 21))
    cols = [("url", "string"), ("text", "string")]
    with_id = lambda df: df.withColumn("doc_id", F.xxhash64("url"))
    prev = with_id(literal_df(
        spark,
        [
            ("https://a/1", t),
            ("https://a/2", t + " tail"),          # near-dup of a/1
            ("https://a/3", "gone page body xyz"),
            ("https://a/4", "stable unrelated document about spark"),
        ],
        cols,
    ))
    curr = with_id(literal_df(
        spark,
        [
            ("https://a/1", t),                     # unchanged
            ("https://a/2", "rewritten beyond recognition qq ww ee"),
            ("https://a/4", "stable unrelated document about spark"),
            ("https://a/5", t + " coda"),           # new, near-dup of a/1
        ],
        cols,
    ))

    def snap(docs):
        return docs.select(
            F.col("url").alias("url_canon"),
            F.sha2(F.col("text"), 256).alias("content_sha"),
        )

    diff = W.snapshot_diff(snap(prev), snap(curr))

    state = init_dedup_state(prev, threshold=0.8)
    doomed = diff.filter(F.col("status").isin("gone", "changed")).select(
        F.xxhash64("url_canon").alias("id")
    )
    state = remove_docs(doomed, state)
    batch = W.refetch_set(diff).select("url_canon").join(
        curr, F.col("url_canon") == F.col("url"), "inner"
    ).select("doc_id", "text")
    state = update_dedup_state(batch, state, threshold=0.8)
    rebuilt = init_dedup_state(curr, threshold=0.8)

    canon = {r.id: r.canonical_id for r in state["canon"].collect()}
    want = {r.id: r.canonical_id for r in rebuilt["canon"].collect()}
    assert canon == want
    ids = {r.url: r.doc_id for r in curr.collect()}
    gone_id = [r.doc_id for r in prev.collect() if r.url == "https://a/3"][0]
    assert canon[ids["https://a/5"]] == canon[ids["https://a/1"]]  # joined
    assert gone_id not in canon                                    # gone
    got_docs = {tuple(r) for r in state["docs"].collect()}
    want_docs = {tuple(r) for r in rebuilt["docs"].collect()}
    assert got_docs == want_docs

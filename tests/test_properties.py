"""Property-based hardening of the pure-Python dedup/text kernels
(hypothesis; SURVEY.md §5 "mirroring + hardening" — the reference has no
randomized testing, §5.7). All targets are driver-side pure functions
(functions/dedup_text.py, textnorm.py), so each example is microseconds:
no Spark session in this module.

The properties are the algebra the distributed operators RELY on:
- minhash's union law (sig(A∪B) = elementwise min) is exactly why a
  band-key shuffle join approximates Jaccard at corpus scale;
- normalization idempotence is why re-ingesting committed rows cannot
  re-key identities (the resume/replay guarantees);
- the entropy/jaccard bounds are the gate thresholds' domain contract.

Settings: derandomized (fixed seed) so CI is deterministic — hypothesis
still explores the space far beyond the hand-picked vectors in
tests/test_dedup_kernels.py.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphiti_spark.config import (
    MINHASH_BAND_SIZE,
    MINHASH_PERMUTATIONS,
)
from graphiti_spark.functions.dedup_text import (
    has_high_entropy,
    jaccard_similarity,
    lsh_bands,
    minhash_signature,
    name_entropy,
    normalize_name_for_fuzzy,
    normalize_string_exact,
    shingles,
)
from graphiti_spark.textnorm import clean_input, truncate_at_sentence

DET = settings(
    max_examples=200,
    derandomize=True,
    suppress_health_check=[HealthCheck.filter_too_much],
)

names = st.text(max_size=60)
shingle_sets = st.sets(
    st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122),
        min_size=1,
        max_size=3,
    ),
    max_size=20,
)


@given(a=shingle_sets, b=shingle_sets)
@DET
def test_minhash_union_law(a, b):
    """sig(A ∪ B)[i] == min(sig(A)[i], sig(B)[i]) — the monoid identity
    that makes MinHash mergeable (and map-side combinable) regardless of
    how a distributed engine partitions the shingle stream."""
    sa, sb, su = (
        minhash_signature(a),
        minhash_signature(b),
        minhash_signature(a | b),
    )
    if not a:
        assert su == sb
    elif not b:
        assert su == sa
    else:
        assert su == tuple(min(x, y) for x, y in zip(sa, sb))


@given(s=shingle_sets)
@DET
def test_minhash_shape_and_determinism(s):
    sig = minhash_signature(s)
    assert sig == minhash_signature(set(s))  # order/identity independent
    if s:
        assert len(sig) == MINHASH_PERMUTATIONS
        assert all(isinstance(v, int) and 0 <= v < 2**64 for v in sig)
        bands = lsh_bands(sig)
        assert len(bands) == MINHASH_PERMUTATIONS // MINHASH_BAND_SIZE
        assert all(len(b) == MINHASH_BAND_SIZE for b in bands)
        # bands tile the signature in order
        assert tuple(v for b in bands for v in b) == sig
    else:
        assert sig == ()
        assert lsh_bands(sig) == []


@given(a=shingle_sets, b=shingle_sets, c=shingle_sets)
@DET
def test_jaccard_metric_properties(a, b, c):
    j = jaccard_similarity
    assert 0.0 <= j(a, b) <= 1.0
    assert j(a, b) == j(b, a)
    assert j(a, a) == 1.0
    # exact definition (the gate threshold is a domain value, not fuzz)
    if a and b:
        assert j(a, b) == len(a & b) / len(a | b)
    elif not a and not b:
        assert j(a, b) == 1.0
    else:
        assert j(a, b) == 0.0


@given(name=names)
@DET
def test_normalization_idempotent_and_ordered(name):
    """exact∘exact = exact and fuzzy∘fuzzy = fuzzy: replaying committed
    rows through the ingest re-derives identical identities (the
    resume/replay contract rests on this); fuzzy is also a no-op on
    already-exact-normalized text's case/whitespace."""
    e = normalize_string_exact(name)
    assert normalize_string_exact(e) == e
    f = normalize_name_for_fuzzy(name)
    assert normalize_name_for_fuzzy(f) == f
    # fuzzy output's alphabet contract: [a-z0-9' ] only, no edge/double spaces
    assert all(ch.islower() or ch.isdigit() or ch in "' " for ch in f)
    assert "  " not in f and f == f.strip()
    # fuzzy factors through exact
    assert normalize_name_for_fuzzy(e) == f


@given(name=names)
@DET
def test_entropy_bounds_and_gate_domain(name):
    n = normalize_name_for_fuzzy(name)
    h = name_entropy(n)
    stripped = n.replace(" ", "")
    assert h >= 0.0
    if stripped:
        # max entropy = log2(alphabet size actually used)
        assert h <= math.log2(len(set(stripped))) + 1e-9
    else:
        assert h == 0.0
    assert has_high_entropy(n) in (True, False)  # total on the domain
    if len(set(stripped)) <= 1:
        # degenerate names can never pass the 1.5-bit gate
        assert not has_high_entropy(n)


@given(name=names)
@DET
def test_shingles_cover_and_bound(name):
    n = normalize_name_for_fuzzy(name)
    sh = shingles(n)
    cleaned = n.replace(" ", "")
    if not cleaned:
        assert sh == set()
    elif len(cleaned) < 2:
        assert sh == {cleaned}
    else:
        assert len(sh) <= max(1, len(cleaned) - 2)
        assert all(1 <= len(s) <= 3 for s in sh)
        # every shingle is a substring of the cleaned name
        assert all(s in cleaned for s in sh)


@given(text=st.text(max_size=300), max_chars=st.integers(1, 200))
@DET
def test_truncate_at_sentence_contract(text, max_chars):
    out = truncate_at_sentence(text, max_chars)
    if len(text) <= max_chars:
        assert out == text
    else:
        # bounded, a prefix (mod trailing-space strip), idempotent
        assert len(out) <= max_chars
        assert text.startswith(out) or out == text[: max_chars].rstrip()
        assert truncate_at_sentence(out, max_chars) == out


@given(text=st.text(max_size=300))
@DET
def test_clean_input_idempotent(text):
    c = clean_input(text)
    assert clean_input(c) == c
    # keeps the whitelisted whitespace, drops other C0 controls
    assert not any(
        ord(ch) < 32 and ch not in "\n\r\t" for ch in c
    )

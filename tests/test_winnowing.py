"""Winnowing fingerprint kernel (queries.winnow_fingerprints) vs a
naive pure-Python reference of the Schleimer–Wilkerson–Aiken scheme:
k-gram polynomial hashes, w-window min selection, per-doc aggregates.
No Spark needed — the kernel is a plain numpy batch function."""

from demeton_spark.queries import _FP_B, _FP_K, _FP_P, _FP_W, winnow_fingerprints


def naive_winnow(t: str):
    cs = [ord(c) for c in (t if t else "\x00")] + [0] * _FP_K
    n = max(1, len(t) - (_FP_K - 1))
    hs = []
    for i in range(n):
        h = 0
        for j in range(_FP_K):
            h = (h * _FP_B + cs[i + j]) % _FP_P
        hs.append(h)
    sel = [
        min(hs[max(0, p - _FP_W + 1) : p + 1])
        for p in range(min(_FP_W, n) - 1, n)
    ]
    return min(sel), max(sel), len(set(sel)), n


CASES = [
    "",
    "a",
    "ab",
    "abcdefg",  # one char short of k
    "abcdefgh",  # exactly k
    "abcdefghi",
    "abcdefghijk",  # n_grams == w
    "hello world this is a longer doc with text",
    "x" * 100,  # constant text: one distinct fingerprint
    "the quick brown fox jumps over the lazy dog " * 7,
]


def test_kernel_matches_naive_reference():
    mn, mx, nf, ng = winnow_fingerprints(CASES)
    for i, t in enumerate(CASES):
        assert (mn[i], mx[i], nf[i], ng[i]) == naive_winnow(t), repr(t)[:40]


def test_constant_text_selects_single_fingerprint():
    _, _, nf, _ = winnow_fingerprints(["z" * 500])
    assert nf[0] == 1


def test_winnowing_density_and_shift_tolerance():
    """On non-repetitive text the selected set has density ~2/(w+1) of
    the grams; on any text a pure prefix shift leaves the shared
    windows' selections identical (shift tolerance — the property the
    fingerprint exists for)."""
    import random

    rng = random.Random(11)
    base = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(800))
    shifted = "PREFIX-123 " + base
    mn, mx, nf, ng = winnow_fingerprints([base, shifted])
    assert mn[0] == mn[1]  # identical tail content → same min fingerprint
    assert nf[0] >= ng[0] // (2 * _FP_W)  # ~2/(w+1) density, generous floor

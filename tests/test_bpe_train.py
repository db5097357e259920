"""BPE merge training (operators/text.py:bpe_train).

Brute-force Python twin (per-word greedy leftmost merge loop — structurally
unrelated to the relational island-parity restatement) on constructed
corpora, including the overlap case (left == right) the island logic exists
for.
"""

from __future__ import annotations

from collections import Counter

import pytest

from data_engineering_project_spark.operators import text as T


def _py_bpe(word_counts: dict[str, int], rounds: int):
    words = {w: list(w) for w in word_counts}

    def merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += word_counts[w]
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((r, a, b, n, a + b))
        for w in words:
            words[w] = merge(words[w], a, b)
    return merges


def _spark_bpe(spark, word_counts: dict[str, int], rounds: int):
    words = spark.createDataFrame(
        sorted(word_counts.items()), schema="word string, cnt long"
    )
    return T.bpe_train(words, rounds)


@pytest.mark.parametrize(
    "corpus",
    [
        # overlap path: runs of identical chars force left == right merges
        {"aaaa": 10, "aaab": 5, "baaa": 3},
        # plain english-ish mix
        {"lower": 7, "lowest": 5, "newer": 6, "wider": 3, "new": 2},
        # single chars and empty-pair exhaustion (more rounds than pairs)
        {"ab": 4, "a": 9, "b": 9},
        # tie-breaking: every pair count equal -> lexicographic argmax
        {"ab": 1, "cd": 1, "ef": 1},
    ],
)
def test_bpe_train_matches_bruteforce(spark, corpus):
    assert _spark_bpe(spark, corpus, 5) == _py_bpe(corpus, 5)


def test_bpe_train_overlap_is_greedy_leftmost(spark):
    # 'aaaaa' x1: round 1 merges (a,a) at offsets 0-1 and 2-3, leaving
    # [aa, aa, a] -> pair counts round 2: (aa,aa)=1, (aa,a)=1 -> argmax
    # lexicographic: (aa,a). Wrong overlap handling (e.g. merging all three
    # adjacent occurrences) would change both the count and the survivors.
    merges = _spark_bpe(spark, {"aaaaa": 1}, 2)
    assert merges[0] == (1, "a", "a", 4, "aa")
    assert merges[1] == (2, "aa", "a", 1, "aaa")


from hypothesis import given, settings
from hypothesis import strategies as st

# two-letter alphabet maximizes repeated-pair/overlap density per example;
# small word set keeps each Spark round cheap
_CORPORA = st.dictionaries(
    st.text(alphabet="ab", min_size=1, max_size=7),
    st.integers(min_value=1, max_value=9),
    min_size=1,
    max_size=6,
)


@given(corpus=_CORPORA)
@settings(max_examples=10, deadline=None)
def test_bpe_train_property_matches_bruteforce(spark, corpus):
    assert _spark_bpe(spark, corpus, 3) == _py_bpe(corpus, 3)

"""Binary bag-of-words vocabulary: hierarchical k-medians, transform, score.

TPU-native replacement for DBoW2's ``TemplatedVocabulary`` + ``FORB``
(reference Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:135-241,
FORB.h:38-47): the vocabulary is a per-level array of binary centers; the
image->BoW transform is a batched tree descent where each level is one
masked Hamming argmin over gathered child centers (vectorized popcount,
not pointer chasing); BoW vectors are **dense** tf-idf arrays so database
scoring is one vectorized L1 sweep (see models/keyframe_db.py) instead of
an inverted file.

The reference expects a pretrained 1M-leaf ORBvoc.txt which is absent from
the repo (SURVEY.md §5-checkpoint); vocabularies here are trained on the
fly from descriptors (k-medians with bitwise-majority centroids), which is
what DBoW2's ``create`` does (TemplatedVocabulary.h HKmeansStep).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    centers: Sequence[jnp.ndarray]  # per level l: [k^(l+1), 8] uint32
    idf: jnp.ndarray                # [V] inverse document frequency
    k: int
    levels: int

    @property
    def n_words(self) -> int:
        return self.k ** self.levels


def _unpack_bits(desc):
    """[D,8] uint32 -> [D,256] float32 bits."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.float32)


def _pack_bits(bits):
    """[D,256] bool -> [D,8] uint32."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def _hamming(a, b):
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_nodes", "k", "iters"))
def _kmedians_level(desc, assign, n_nodes: int, k: int, key, iters: int = 8):
    """Split each node's descriptors into k children by Hamming k-medians.

    assign: [D] current node id in [0, n_nodes). Returns
    (child_centers [n_nodes*k, 8], new_assign [D] in [0, n_nodes*k)).
    """
    D = desc.shape[0]
    bits = _unpack_bits(desc)  # [D,256]

    # init: per node pick k random member descriptors as seeds
    noise = jax.random.uniform(key, (D,))
    order = jnp.argsort(assign.astype(jnp.float32) * 10.0 + noise)
    # first k of each node along the sorted order
    sorted_assign = assign[order]
    rank = jnp.arange(D) - jnp.searchsorted(sorted_assign, sorted_assign, side="left")
    seed_slot = sorted_assign * k + jnp.minimum(rank, k - 1)
    centers = jnp.zeros((n_nodes * k, 8), jnp.uint32).at[seed_slot].set(desc[order])

    def step(_, centers):
        # distances to own node's k children
        child_ids = assign[:, None] * k + jnp.arange(k)[None, :]  # [D,k]
        cc = centers[child_ids]  # [D,k,8]
        dist = jnp.sum(
            jax.lax.population_count(jnp.bitwise_xor(desc[:, None, :], cc)),
            axis=-1,
        )
        sub = jnp.argmin(dist, axis=-1)  # [D]
        newa = assign * k + sub
        # bitwise majority per child
        votes = jax.ops.segment_sum(bits, newa, num_segments=n_nodes * k)
        cnt = jax.ops.segment_sum(jnp.ones((D,)), newa, num_segments=n_nodes * k)
        maj = votes > 0.5 * jnp.maximum(cnt, 1.0)[:, None]
        new_centers = _pack_bits(maj)
        # keep seed for empty clusters
        return jnp.where((cnt > 0)[:, None], new_centers, centers)

    centers = jax.lax.fori_loop(0, iters, step, centers)
    child_ids = assign[:, None] * k + jnp.arange(k)[None, :]
    dist = jnp.sum(
        jax.lax.population_count(
            jnp.bitwise_xor(desc[:, None, :], centers[child_ids])
        ),
        axis=-1,
    )
    newa = assign * k + jnp.argmin(dist, axis=-1)
    return centers, newa


def train(desc, k: int = 10, levels: int = 4, seed: int = 0) -> Vocabulary:
    """Train a k^levels-word vocabulary from [D,8] uint32 descriptors."""
    desc = jnp.asarray(desc)
    D = desc.shape[0]
    assign = jnp.zeros((D,), jnp.int32)
    key = jax.random.PRNGKey(seed)
    centers_all = []
    n_nodes = 1
    for l in range(levels):
        key, sub = jax.random.split(key)
        centers, assign = _kmedians_level(desc, assign, n_nodes, k, sub)
        centers_all.append(centers)
        n_nodes *= k
    # idf from training corpus: log(D / (1 + df))
    V = n_nodes
    df = jax.ops.segment_sum(jnp.ones((D,)), assign, num_segments=V)
    idf = jnp.log(jnp.maximum(D, 1.0) / (1.0 + df))
    return Vocabulary(centers=tuple(centers_all), idf=idf, k=k, levels=levels)


@partial(jax.jit, static_argnames=("k", "levels"))
def _transform_impl(centers, desc, valid, k: int, levels: int):
    N = desc.shape[0]
    node = jnp.zeros((N,), jnp.int32)
    mid = jnp.zeros((N,), jnp.int32)
    for l in range(levels):
        child_ids = node[:, None] * k + jnp.arange(k)[None, :]
        cc = centers[l][child_ids]
        dist = jnp.sum(
            jax.lax.population_count(jnp.bitwise_xor(desc[:, None, :], cc)),
            axis=-1,
        )
        node = node * k + jnp.argmin(dist, axis=-1).astype(jnp.int32)
        if l == max(levels - 3, 0):
            mid = node  # feature-grouping node (DBoW2 levelsup semantics,
            # reference src/Frame.cc:400 uses leaves-4; scaled to our depth)
    word = jnp.where(valid, node, -1)
    return word, jnp.where(valid, mid, -1)


def save(path: str, voc: Vocabulary) -> None:
    """Persist a trained vocabulary (replaces the reference's ORBvoc.txt
    text format, TemplatedVocabulary::loadFromTextFile)."""
    import numpy as np

    np.savez_compressed(
        path,
        k=voc.k,
        levels=voc.levels,
        idf=np.asarray(voc.idf),
        **{f"centers_{i}": np.asarray(c) for i, c in enumerate(voc.centers)},
    )


def load(path: str) -> Vocabulary:
    import numpy as np

    data = np.load(path)
    k = int(data["k"])
    levels = int(data["levels"])
    centers = tuple(
        jnp.asarray(data[f"centers_{i}"]) for i in range(levels)
    )
    return Vocabulary(
        centers=centers, idf=jnp.asarray(data["idf"]), k=k, levels=levels
    )


def transform(voc: Vocabulary, desc, valid):
    """[N,8] descriptors -> (word ids [N], mid-level node ids [N]); -1 pad."""
    return _transform_impl(voc.centers, desc, valid, voc.k, voc.levels)


@partial(jax.jit, static_argnames=("n_words",))
def bow_vector(word, n_words: int, idf):
    """Dense L1-normalized tf-idf vector [V] from word ids [N]."""
    ok = word >= 0
    v = jnp.zeros((n_words,), jnp.float32).at[
        jnp.where(ok, word, n_words)
    ].add(jnp.where(ok, 1.0, 0.0), mode="drop")
    v = v * idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


def l1_score(a, b):
    """DBoW2 L1 similarity: 1 - 0.5*|a-b|_1 for L1-normalized vectors
    (ScoringObject.cpp L1Scoring; range [0,1], 1 = identical)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(a - b), axis=-1)


def match_by_words(
    word_a, desc_a, valid_a, word_b, desc_b, valid_b, th=50, ratio=0.7
):
    """SearchByBoW equivalent (reference src/ORBmatcher.cc:159-288): only
    descriptor pairs sharing a vocabulary word compete — here a dense
    masked argmin with word-equality mask (the reference walks aligned
    FeatureVector buckets; equality masking is the same constraint)."""
    from . import matching

    mask = (
        valid_a[:, None]
        & valid_b[None, :]
        & (word_a[:, None] == word_b[None, :])
        & (word_a >= 0)[:, None]
    )
    dist = matching.hamming_matrix(desc_a, desc_b)
    bi, bd, b2 = matching.best_two(dist, mask)
    ok = (bd <= th) & (bd.astype(jnp.float32) <= ratio * b2.astype(jnp.float32))
    ok = matching._resolve_one_to_one(ok, bi, bd, desc_b.shape[0])
    return jnp.where(ok, bi, -1), jnp.where(ok, bd, 1 << 20)

"""Packed-sequence tests: bin packing + segment-id attention equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.data.packed_sequence import first_fit_pack, pack_batch
from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel


def test_first_fit_pack():
    lengths = [5, 3, 7, 2, 6]
    bins = first_fit_pack(lengths, bin_size=8)
    assert all(sum(lengths[i] for i in b) <= 8 for b in bins)
    packed = sorted(i for b in bins for i in b)
    assert packed == [0, 1, 2, 3, 4]
    # over-long samples dropped
    assert first_fit_pack([10], 8) == []


@pytest.mark.slow
def test_packed_forward_matches_separate():
    cfg = tiny_test(seq_length=16, scan_layers=False, remat="none")
    model = GPTModel(cfg)
    rng = np.random.RandomState(0)
    s1 = rng.randint(1, 100, 6).astype(np.int32)
    s2 = rng.randint(1, 100, 9).astype(np.int32)
    packed = pack_batch(
        [s1, s2], [s1, s2],
        [np.ones_like(s1, np.float32), np.ones_like(s2, np.float32)],
        bin_size=16,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32))
    lp = model.apply(
        variables,
        jnp.asarray(packed["tokens"]),
        jnp.asarray(packed["positions"]),
        segment_ids=jnp.asarray(packed["segment_ids"]),
    )
    l1 = model.apply(variables, jnp.asarray(s1[None]))
    l2 = model.apply(variables, jnp.asarray(s2[None]))
    seg = packed["segment_ids"][0]
    lp0 = np.asarray(lp[0])
    by_len = {6: np.asarray(l1[0]), 9: np.asarray(l2[0])}
    for s_id in (1, 2):
        rows = lp0[seg == s_id]
        np.testing.assert_allclose(rows, by_len[len(rows)], atol=1e-4)

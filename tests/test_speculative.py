"""Speculative decoding (VERDICT r2 #7): draft-proposed, target-verified
greedy decode must be TOKEN-EXACT vs vanilla greedy decoding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.generate import (
    GenerationEngine, SamplingParams, SpeculativeEngine)
from nemo_tpu.models.llm.train import GPTTrainModule
from nemo_tpu.parallel.mesh import MeshConfig


@pytest.fixture(scope="module")
def models():
    tgt_cfg = tiny_test(num_layers=3, seq_length=128)
    tgt = GPTTrainModule(tgt_cfg, mesh_cfg=MeshConfig(dp=8))
    tgt_params = tgt.init_state(seed=0).params
    drf_cfg = tiny_test(num_layers=1, seq_length=128)
    drf = GPTTrainModule(drf_cfg, mesh_cfg=MeshConfig(dp=8))
    drf_params = drf.init_state(seed=3).params
    return tgt_cfg, tgt_params, drf_cfg, drf_params


def _vanilla(cfg, params, prompts, max_new):
    eng = GenerationEngine(cfg, params, cache_dtype=jnp.float32)
    return eng.generate_tokens(
        prompts, SamplingParams(greedy=True, max_new_tokens=max_new))


@pytest.mark.parametrize("k", [1, 3])
def test_speculative_token_exact_vs_vanilla(models, k):
    tgt_cfg, tgt_params, drf_cfg, drf_params = models
    prompts = [[5, 9, 23, 41], [7, 11, 2, 30, 19, 54]]
    want = _vanilla(tgt_cfg, tgt_params, prompts, 16)
    spec = SpeculativeEngine(tgt_cfg, tgt_params, drf_cfg, drf_params, k=k,
                             cache_dtype=jnp.float32)
    got, rate = spec.generate_tokens(prompts, max_new_tokens=16)
    assert got == want, (got, want, rate)
    assert 0.0 <= rate <= 1.0


def test_speculative_self_draft_accepts_everything(models):
    """Draft == target → every proposal accepted (rate 1.0 over active
    rounds) and output still exact."""
    tgt_cfg, tgt_params, _, _ = models
    prompts = [[5, 9, 23, 41]]
    want = _vanilla(tgt_cfg, tgt_params, prompts, 12)
    spec = SpeculativeEngine(tgt_cfg, tgt_params, tgt_cfg, tgt_params, k=3,
                             cache_dtype=jnp.float32)
    got, rate = spec.generate_tokens(prompts, max_new_tokens=12)
    assert got == want, (got, want)
    # 12 tokens need only ceil(11/4)=3 active rounds of k=3 accepted
    assert rate * 12 * 3 >= 9 - 1e-6  # all active-round proposals accepted

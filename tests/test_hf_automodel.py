"""HF AutoModel (transformers Flax) training through the nemo_tpu Trainer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")

from nemo_tpu.llm.hf_automodel import HFAutoModelForCausalLM


def _tiny():
    cfg = transformers.GPT2Config(
        vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=2)
    return HFAutoModelForCausalLM(config=cfg, learning_rate=5e-3)


def test_hf_automodel_train_steps_reduce_loss():
    mod = _tiny()
    state = mod.init_state()
    rng = np.random.RandomState(0)
    batch = {
        "tokens": jnp.asarray(rng.randint(0, 128, (4, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 128, (4, 32)), jnp.int32),
        "loss_mask": jnp.ones((4, 32), jnp.float32),
    }
    losses = []
    for i in range(6):
        state, m = mod.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_hf_automodel_with_trainer():
    from nemo_tpu.core.trainer import Trainer

    mod = _tiny()

    class DM:
        def train_batches(self, start_step):
            rng = np.random.RandomState(1)
            def gen():
                while True:
                    t = jnp.asarray(rng.randint(0, 128, (2, 16)), jnp.int32)
                    yield {"tokens": t, "labels": t,
                           "loss_mask": jnp.ones((2, 16), jnp.float32)}
            return gen()

    tr = Trainer(max_steps=3, callbacks=[])
    metrics = tr.fit(mod, DM())
    assert np.isfinite(float(metrics["loss"]))
    assert int(tr.state.step) == 3


@pytest.mark.slow
def test_hf_automodel_greedy_generate():
    mod = _tiny()
    state = mod.init_state()
    out = mod.generate_greedy(state, jnp.asarray([[1, 2, 3]], jnp.int32),
                              max_new_tokens=4)
    assert out.shape == (1, 7)

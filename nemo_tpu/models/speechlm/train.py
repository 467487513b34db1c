"""SALM training: Trainer-protocol module + mock data module.

Reference parity: `nemo/collections/speechlm/models/speech_to_text_llm.py`
(SpeechToTextLLM training loop: audio → frozen/finetuned encoder → modality
adapter → LLM, CE on answer tokens) and speechlm data
(`speechlm/data/audio_text_dataset.py` question-answer manifests). The
batch contract matches SALM.loss_fn: {audio, audio_len, tokens,
loss_mask}."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

import flax.linen as nn

from nemo_tpu.models.speechlm.salm import SALM, SALMConfig


class SALMTrainModule:
    """Trainer protocol around SALM.loss_fn (handles the conv-encoder
    batch_stats collection as part of the train state).

    freeze: any of {"llm", "speech", "adapter"} — the reference's
    freeze_llm/freeze_speech/freeze_modality_adapter controls
    (speech_to_text_llm_model.py:743-779). Frozen subtrees get
    set_to_zero updates (same params tree, no module surgery)."""

    def __init__(self, cfg: SALMConfig, lr_schedule=None,
                 freeze: tuple = ()):
        self.cfg = cfg
        self.salm = SALM(cfg, init_params=True)
        sched = lr_schedule or (lambda step: 1e-4)
        base = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(sched))
        if freeze:
            def label(params):
                def lab(top):
                    if top == "llm":
                        return "llm"
                    if top == "encoder":
                        return "speech"
                    return "adapter"  # projector / frame-stacking head

                return jax.tree_util.tree_map_with_path(
                    lambda p, _: lab(p[0].key), params)

            # zero frozen grads FIRST, then ONE shared clip+adamw chain:
            # per-group clipping (multi_transform of whole chains) would
            # clip each unfrozen group independently — different dynamics
            # from the reference's single global clip
            zero_frozen = optax.multi_transform(
                {k: (optax.set_to_zero() if k in freeze else optax.identity())
                 for k in ("llm", "speech", "adapter")}, label)
            self.optimizer = optax.chain(zero_frozen, base)
        else:
            self.optimizer = base
        self.freeze = tuple(freeze)
        self._jit = None

    def trainable_parameters(self, params):
        """Leaves that receive nonzero updates (reference
        trainable_parameters, speech_to_text_llm_model.py:779)."""
        out = []

        def lab(top):
            return {"llm": "llm", "encoder": "speech"}.get(top, "adapter")

        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            if lab(path[0].key) not in self.freeze:
                out.append(("/".join(str(k.key) for k in path), leaf))
        return out

    def init_state(self, seed: int = 0):
        from nemo_tpu.models.llm.train import TrainState

        variables = self.salm.variables
        params = nn.meta.unbox(variables["params"])
        self._batch_stats0 = variables.get("batch_stats", {})
        return TrainState(step=jnp.zeros((), jnp.int32),
                          params={"params": params,
                                  "batch_stats": self._batch_stats0},
                          opt_state=self.optimizer.init(params))

    def train_step(self, state, batch, rng=None):
        from nemo_tpu.models.llm.train import TrainState

        if self._jit is None:
            opt, salm = self.optimizer, self.salm

            def step(state, batch, rng):
                p = state.params["params"]
                bs = state.params["batch_stats"]

                def lf(p):
                    return salm.loss_fn(p, bs, batch, rng)

                (loss, new_bs), grads = jax.value_and_grad(
                    lf, has_aux=True)(p)
                updates, new_opt = opt.update(grads, state.opt_state, p)
                p = optax.apply_updates(p, updates)
                return (TrainState(step=state.step + 1,
                                   params={"params": p,
                                           "batch_stats": new_bs},
                                   opt_state=new_opt),
                        {"loss": loss,
                         "grad_norm": optax.global_norm(grads)})

            self._jit = jax.jit(step, donate_argnums=(0,))
        if rng is None:
            rng = jax.random.PRNGKey(int(state.step))
        return self._jit(state, batch, rng)


class MockSpeechLMDataModule:
    """Random (audio, prompt+answer) batches at the SALM batch contract
    (the speechlm audio_text_dataset mock analog)."""

    def __init__(self, audio_secs: float = 1.0, sample_rate: int = 16000,
                 seq_length: int = 32, global_batch_size: int = 2,
                 vocab_size: int = 128, answer_len: int = 8, seed: int = 0):
        self.T = int(audio_secs * sample_rate)
        self.seq_length = seq_length
        self.global_batch_size = global_batch_size
        self.vocab_size = vocab_size
        self.answer_len = answer_len
        self.seed = seed
        self.micro_batch_size = None

    def train_batches(self, start_step: int = 0):
        rng = np.random.RandomState(self.seed + start_step)
        B, L = self.global_batch_size, self.seq_length
        while True:
            mask = np.zeros((B, L), np.float32)
            mask[:, -self.answer_len:] = 1.0
            yield {
                "audio": jnp.asarray(
                    rng.randn(B, self.T).astype(np.float32) * 0.1),
                "audio_len": jnp.full((B,), self.T, jnp.int32),
                "tokens": jnp.asarray(
                    rng.randint(1, self.vocab_size, (B, L)).astype(np.int32)),
                "loss_mask": jnp.asarray(mask),
            }

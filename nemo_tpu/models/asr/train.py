"""ASR training modules (CTC / RNNT) — jitted steps for the Trainer.

Reference parity: EncDecCTCModel.training_step (`asr/models/ctc_models.py:549`:
preprocess → SpecAugment → encoder → decoder → CTC loss) and the RNNT
equivalent, as single jit-compiled steps with BatchNorm batch_stats updates
and on-chip augmentation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from nemo_tpu.models.asr.ctc_models import EncDecCTCModel
from nemo_tpu.ops.audio import mel_spectrogram
from nemo_tpu.ops.ctc import ctc_loss_mean
from nemo_tpu.ops.spec_augment import spec_augment


class ASRTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass
class CTCTrainModule:
    """Wraps an EncDecCTCModel for training (Trainer protocol)."""

    model: EncDecCTCModel
    optimizer: Optional[optax.GradientTransformation] = None
    lr_schedule: Any = None
    use_spec_augment: bool = True
    freq_masks: int = 2
    time_masks: int = 10
    freq_width: int = 27
    time_width: float = 0.05
    # InterCTC (reference: intermediate-layer aux CTC losses); weight λ:
    # loss = (1-λ)·ctc + λ·mean(aux) when the encoder sows interctc captures
    interctc_weight: float = 0.0

    def __post_init__(self):
        if self.optimizer is None:
            sched = self.lr_schedule or (lambda s: 1e-3)
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(sched, b1=0.9, b2=0.98, weight_decay=1e-3),
            )
        self._jit_step = jax.jit(self._step)
        self._jit_eval = jax.jit(self._eval)

    def init_state(self) -> ASRTrainState:
        v = self.model.variables
        params = v["params"]
        return ASRTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=v.get("batch_stats", {}),
            opt_state=self.optimizer.init(params),
        )

    def _forward_loss(self, params, batch_stats, batch, rng):
        m = self.model
        r1, r2, r3 = jax.random.split(rng, 3)
        feats, feat_len = mel_spectrogram(
            batch["audio"], batch["audio_len"], m.mel_cfg, training=True, rng=r1
        )
        if self.use_spec_augment:
            feats = spec_augment(
                r2, feats, feat_len, self.freq_masks, self.time_masks,
                self.freq_width, self.time_width,
            )
        mutable = ["batch_stats"]
        if self.interctc_weight > 0:
            mutable = ["batch_stats", "intermediates"]
        (log_probs, enc_len), updates = m.net.apply(
            {"params": params, "batch_stats": batch_stats},
            feats, feat_len, train=True,
            mutable=mutable, rngs={"dropout": r3},
        )
        loss = ctc_loss_mean(log_probs, enc_len, batch["text"], batch["text_len"])
        if self.interctc_weight > 0:
            import jax.tree_util as jtu

            caps = [
                v for path, v in jtu.tree_flatten_with_path(
                    updates.get("intermediates", {}))[0]
                if "interctc" in jtu.keystr(path)
            ]
            if caps:
                # reuse the main decoder head on intermediate activations
                dec = {"params": params["decoder"]}
                from nemo_tpu.models.asr.modules.conv_asr import ConvASRDecoder

                head = ConvASRDecoder(feat_in=m.net.d_enc, num_classes=len(m.labels))
                aux = 0.0
                for c in caps:
                    lp = head.apply(dec, c)
                    aux = aux + ctc_loss_mean(lp, enc_len, batch["text"], batch["text_len"])
                aux = aux / len(caps)
                loss = (1.0 - self.interctc_weight) * loss + self.interctc_weight * aux
        return loss, updates["batch_stats"]

    def _step(self, state: ASRTrainState, batch, rng):
        (loss, new_bs), grads = jax.value_and_grad(self._forward_loss, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return (
            ASRTrainState(step=state.step + 1, params=params,
                          batch_stats=new_bs, opt_state=new_opt),
            metrics,
        )

    def train_step(self, state, batch, rng):
        return self._jit_step(state, batch, rng)

    # -- eval -----------------------------------------------------------------
    def _eval(self, params, batch_stats, batch):
        m = self.model
        feats, feat_len = mel_spectrogram(
            batch["audio"], batch["audio_len"], m.mel_cfg, training=False
        )
        log_probs, enc_len = m.net.apply(
            {"params": params, "batch_stats": batch_stats}, feats, feat_len, train=False
        )
        loss = ctc_loss_mean(log_probs, enc_len, batch["text"], batch["text_len"])
        return loss, log_probs, enc_len

    def eval_step(self, state, batch) -> Dict[str, float]:
        loss, log_probs, enc_len = self._jit_eval(state.params, state.batch_stats, batch)
        return {"loss": float(loss)}

    def sync_model(self, state: ASRTrainState) -> None:
        """Copy trained variables back into the model (for transcribe/save)."""
        self.model.variables = {"params": state.params, "batch_stats": state.batch_stats}

"""Audio enhancement training: Trainer-protocol module + paired mock data.

Reference parity: `nemo/collections/audio/models/enhancement.py`
(EncMaskDecAudioToAudioModel training_step: paired noisy/clean SI-SDR
objective over the masking model). Batch contract: {"noisy" [B,T],
"clean" [B,T]}."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemo_tpu.models.audio.enhancement import MaskingEnhancementModel


class EnhancementTrainModule:
    """Trainer protocol over MaskingEnhancementModel's SI-SNR objective."""

    def __init__(self, cfg=None, lr_schedule=None):
        self.model = MaskingEnhancementModel(cfg or {})
        sched = lr_schedule or (lambda step: 1e-3)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(5.0), optax.adamw(sched))
        self._jit = None

    def init_state(self, seed: int = 0):
        from nemo_tpu.models.llm.train import TrainState

        params = self.model.variables
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.optimizer.init(params))

    def train_step(self, state, batch, rng=None):
        from nemo_tpu.models.llm.train import TrainState
        from nemo_tpu.ops.stft import istft, si_snr, stft

        if self._jit is None:
            opt = self.optimizer
            net = self.model.net
            n_fft, hop = self.model.n_fft, self.model.hop

            def step(state, batch, rng):
                noisy, clean = batch["noisy"], batch["clean"]

                def lf(p):
                    re, im = stft(noisy, n_fft, hop)
                    logmag = jnp.log1p(jnp.sqrt(re * re + im * im))
                    mask = net.apply(p, logmag)
                    est = istft(re * mask, im * mask, n_fft, hop,
                                length=noisy.shape[1])
                    return -jnp.mean(si_snr(est, clean))

                loss, grads = jax.value_and_grad(lf)(state.params)
                updates, new_opt = opt.update(grads, state.opt_state,
                                              state.params)
                params = optax.apply_updates(state.params, updates)
                return (TrainState(step=state.step + 1, params=params,
                                   opt_state=new_opt),
                        {"loss": loss,
                         "grad_norm": optax.global_norm(grads)})

            self._jit = jax.jit(step, donate_argnums=(0,))
        if rng is None:
            rng = jax.random.PRNGKey(int(state.step))
        return self._jit(state, batch, rng)


class MockPairedAudioDataModule:
    """Synthetic (clean, clean+noise) pairs — the audio-to-audio dataset
    analog (reference audio_to_audio_dataset manifests)."""

    def __init__(self, secs: float = 0.5, sample_rate: int = 16000,
                 global_batch_size: int = 4, snr_db: float = 5.0,
                 seed: int = 0):
        self.T = int(secs * sample_rate)
        self.global_batch_size = global_batch_size
        self.snr = 10 ** (-snr_db / 20)
        self.seed = seed
        self.micro_batch_size = None

    def train_batches(self, start_step: int = 0):
        rng = np.random.RandomState(self.seed + start_step)
        B, T = self.global_batch_size, self.T
        t = np.arange(T) / 16000.0
        while True:
            f0 = rng.uniform(100, 800, (B, 1))
            clean = np.sin(2 * np.pi * f0 * t[None]).astype(np.float32) * 0.3
            noise = rng.randn(B, T).astype(np.float32) * 0.3 * self.snr
            yield {"noisy": jnp.asarray(clean + noise),
                   "clean": jnp.asarray(clean)}

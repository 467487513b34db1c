"""Trainer-protocol training for the speechlm / diffusion / audio
collections (reference: each collection's training_step) — the stacks are
trainable end-to-end through core.trainer.Trainer, not just demos."""

import numpy as np

import jax

from nemo_tpu.core.trainer import Trainer


def test_salm_trains_through_trainer():
    from nemo_tpu.models.asr.configs import conformer_ctc
    from nemo_tpu.models.llm.config import tiny_test
    from nemo_tpu.models.speechlm.salm import SALMConfig
    from nemo_tpu.models.speechlm.train import (
        MockSpeechLMDataModule, SALMTrainModule)

    enc = dict(conformer_ctc("large").encoder.to_dict())
    enc.update(n_layers=2, d_model=32, n_heads=4, feat_in=32)
    cfg = SALMConfig(llm=tiny_test(seq_length=64), encoder=enc,
                     mel_features=32, frame_stacking=2)
    mod = SALMTrainModule(cfg)
    dm = MockSpeechLMDataModule(audio_secs=0.2, seq_length=16,
                                global_batch_size=2,
                                vocab_size=tiny_test().vocab_size)
    tr = Trainer(max_steps=3)
    metrics = tr.fit(mod, dm)
    assert np.isfinite(float(metrics["loss"]))


def test_dit_edm_trains_through_trainer():
    from nemo_tpu.models.diffusion.dit import DiTConfig
    from nemo_tpu.models.diffusion.train import (
        DiffusionTrainModule, MockLatentDataModule)

    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=2,
                    hidden_size=32, num_layers=2, num_heads=2,
                    num_classes=4)
    mod = DiffusionTrainModule(cfg)
    dm = MockLatentDataModule(input_size=8, in_channels=2,
                              global_batch_size=4, num_classes=4)
    tr = Trainer(max_steps=3)
    metrics = tr.fit(mod, dm)
    assert np.isfinite(float(metrics["loss"]))


def test_dit_edm_loss_decreases_on_fixed_batch():
    from nemo_tpu.models.diffusion.dit import DiTConfig
    from nemo_tpu.models.diffusion.train import (
        DiffusionTrainModule, MockLatentDataModule)

    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=2,
                    hidden_size=32, num_layers=2, num_heads=2)
    mod = DiffusionTrainModule(cfg)
    state = mod.init_state()
    batch = next(MockLatentDataModule(input_size=8, in_channels=2,
                                      global_batch_size=4).train_batches())
    losses = []
    for i in range(12):
        # FIXED rng: same σ/noise draw so the loss decrease is attributable
        # to learning, not sampling variance
        state, m = mod.train_step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses[::4]


def test_enhancement_trains_and_improves_sisnr():
    from nemo_tpu.models.audio.train import (
        EnhancementTrainModule, MockPairedAudioDataModule)
    from nemo_tpu.ops.stft import si_snr

    import jax.numpy as jnp

    mod = EnhancementTrainModule({"n_fft": 256, "hop": 64, "channels": 8,
                                  "n_layers": 2})
    dm = MockPairedAudioDataModule(secs=0.25, global_batch_size=4)
    state = mod.init_state()
    batch = next(dm.train_batches())
    before = float(jnp.mean(si_snr(
        mod.model.net and mod.model._enhance(state.params, batch["noisy"]),
        batch["clean"])))
    for i in range(30):
        state, m = mod.train_step(state, batch, jax.random.PRNGKey(i))
    after = float(jnp.mean(si_snr(
        mod.model._enhance(state.params, batch["noisy"]), batch["clean"])))
    assert np.isfinite(float(m["loss"]))
    assert after > before, (before, after)

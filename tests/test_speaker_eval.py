"""Speaker model + LLM evaluation tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.core.config import ConfigDict
from nemo_tpu.llm.evaluation import LMEvaluator, evaluate_multiple_choice
from nemo_tpu.models.asr.label_models import EncDecSpeakerLabelModel, angular_margin_loss
from nemo_tpu.models.llm.config import tiny_test
from nemo_tpu.models.llm.gpt import GPTModel


@pytest.fixture(scope="module")
def speaker_model():
    cfg = ConfigDict(
        sample_rate=16000,
        preprocessor=dict(features=32, dither=0.0),
        encoder=dict(feat_in=32, jasper=[
            dict(filters=32, repeat=1, kernel=33, stride=2, separable=True),
            dict(filters=48, repeat=1, kernel=1),
        ]),
        decoder=dict(emb_sizes=64, num_classes=10),
    )
    return EncDecSpeakerLabelModel(cfg)


def test_speaker_embedding_and_verify(speaker_model):
    rng = np.random.RandomState(0)
    a = rng.randn(16000).astype(np.float32) * 0.1
    emb = speaker_model.get_embedding(a)
    assert emb.shape == (64,)
    # same audio verifies as same speaker
    assert speaker_model.verify_speakers(a, a, threshold=0.99)


def test_angular_margin_loss():
    logits = jnp.asarray(np.random.RandomState(0).uniform(-0.9, 0.9, (4, 10)).astype(np.float32))
    labels = jnp.array([1, 2, 3, 4])
    loss = angular_margin_loss(logits, labels)
    assert np.isfinite(float(loss)) and float(loss) > 0


class ByteTok:
    def text_to_ids(self, t):
        return [1 + (b % 120) for b in t.encode()] or [1]

    def ids_to_text(self, ids):
        return bytes(max(32, min(126, i + 31)) for i in ids).decode(errors="replace")


@pytest.fixture(scope="module")
def evaluator():
    cfg = tiny_test()
    model = GPTModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return LMEvaluator(cfg, variables["params"], ByteTok())


def test_loglikelihood(evaluator):
    lp, greedy = evaluator.loglikelihood("the sky is", " blue")
    assert np.isfinite(lp) and lp < 0
    # longer continuation → lower ll
    lp2, _ = evaluator.loglikelihood("the sky is", " blue and full of stars")
    assert lp2 < lp


def test_multiple_choice(evaluator):
    samples = [
        {"context": "q1", "choices": [" a", " b"], "answer": 0},
        {"context": "q2", "choices": [" c", " d"], "answer": 1},
    ]
    out = evaluate_multiple_choice(evaluator, samples)
    assert 0.0 <= out["accuracy"] <= 1.0 and out["n"] == 2


def test_generate_until(evaluator):
    text = evaluator.generate_until("hello", stop=[], max_new=4)
    assert isinstance(text, str)


def test_corpus_bleu_hand_values():
    """BLEU against hand-computed clipped-precision values."""
    from nemo_tpu.models.asr.metrics import BLEU, corpus_bleu

    ref = "the cat is on the mat"
    # identity — sacrebleu 0-100 scale (reference BLEU wraps SacreBLEU)
    assert abs(corpus_bleu([ref], [ref]) - 100.0) < 1e-9
    # all-order partial match, no brevity penalty (hyp longer):
    # p = (6/7)(5/6)(4/5)(3/4) = 3/7 → BLEU = (3/7)^(1/4)
    hyp = "the cat is on the mat tonight"
    expect = 100.0 * (3 / 7) ** 0.25
    assert abs(corpus_bleu([hyp], [ref]) - expect) < 1e-9
    # scale=1.0 restores the 0-1 convention
    assert abs(corpus_bleu([hyp], [ref], scale=1.0) - expect / 100) < 1e-12
    # brevity penalty: perfect prefix of len 5 vs ref len 6 → exp(1-6/5)
    import math
    hyp2 = "the cat is on the"
    assert abs(corpus_bleu([hyp2], [ref]) - 100 * math.exp(1 - 6 / 5)) < 1e-9
    # mismatched lengths raise instead of silently truncating
    import pytest
    with pytest.raises(ValueError):
        corpus_bleu([hyp, hyp2], [ref])
    # clipping: "the the the ..." has 4-gram precision 0 → BLEU 0
    assert corpus_bleu(["the the the the the the the"], [ref]) == 0.0
    # accumulator == one-shot corpus score
    m = BLEU()
    m.update([hyp], [ref])
    m.update([hyp2], [ref])
    assert abs(m.compute() - corpus_bleu([hyp, hyp2], [ref, ref])) < 1e-12
    # multi-reference clipping picks the best per n-gram
    assert corpus_bleu([ref], [[ref, "completely different words"]]) == 100.0

"""The fused greedy rule pass (rules.greedy_rules_argmax) must match the
reference composition apply_rules -> argmax -> chosen - logsumexp exactly,
across every rule-state corner (begin step, open/closed timestamp pairs,
non-decreasing floor, force-timestamp trigger)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.decode.rules import (
    DecodeRules,
    apply_rules,
    greedy_rules_argmax,
)
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL


def _reference(logits, **kw):
    masked = apply_rules(logits, **kw)
    nxt = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    chosen = jnp.take_along_axis(masked, nxt[:, None], axis=-1)[:, 0]
    return nxt, chosen - jax.nn.logsumexp(masked, axis=-1)


def _states(rng, b, rules):
    tb = rules.timestamp_begin
    v = rules.vocab_size
    # a spread of rule states per row: text/ts last tokens, open/closed pairs
    last = rng.choice(
        [rules.eot - 1000, tb, tb + 5, tb + 100, 100], size=b
    ).astype(np.int32)
    penult = rng.choice([200, tb + 3, tb + 50], size=b).astype(np.int32)
    last_ts = rng.choice([0, tb + 2, tb + 80, v - 2], size=b).astype(np.int32)
    return last, penult, last_ts


@pytest.mark.parametrize("timestamps", [True, False])
@pytest.mark.parametrize("step", [0, 1, 2, 7])
def test_fused_matches_reference(timestamps, step):
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=timestamps)
    suppress = jnp.asarray(rules.suppress_mask())
    begin_suppress = jnp.asarray(rules.begin_suppress_mask())
    rng = np.random.RandomState(step + (17 if timestamps else 0))
    b = 8
    logits = jnp.asarray(rng.randn(b, rules.vocab_size).astype(np.float32) * 4)
    last, penult, last_ts = _states(rng, b, rules)
    kw = dict(
        step=jnp.int32(step),
        last_token=jnp.asarray(last),
        penult_token=jnp.asarray(penult),
        last_timestamp=jnp.asarray(last_ts),
        rules=rules,
        suppress=suppress,
        begin_suppress=begin_suppress,
    )
    ref_tok, ref_lp = _reference(logits, **kw)
    got_tok, got_lp = greedy_rules_argmax(logits, **kw)
    np.testing.assert_array_equal(np.asarray(got_tok), np.asarray(ref_tok))
    np.testing.assert_allclose(
        np.asarray(got_lp), np.asarray(ref_lp), rtol=1e-5, atol=1e-5
    )


def test_fused_force_timestamp_branch():
    """Construct logits where the summed timestamp mass beats the best text
    token (rule 6 fires) and where it doesn't, and check both branches."""
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
    suppress = jnp.asarray(rules.suppress_mask())
    begin_suppress = jnp.asarray(rules.begin_suppress_mask())
    tb = rules.timestamp_begin
    v = rules.vocab_size
    logits = np.full((2, v), -8.0, np.float32)
    # row 0: many moderately-likely timestamps, one slightly better text token
    logits[0, tb:] = 2.0
    logits[0, 1000] = 3.0
    # row 1: one dominant text token, negligible timestamp mass
    logits[1, 1000] = 10.0
    logits[1, tb:] = -10.0
    kw = dict(
        step=jnp.int32(3),
        last_token=jnp.asarray([500, 600], np.int32),
        penult_token=jnp.asarray([400, 300], np.int32),
        last_timestamp=jnp.asarray([0, 0], np.int32),
        rules=rules,
        suppress=suppress,
        begin_suppress=begin_suppress,
    )
    ref_tok, ref_lp = _reference(jnp.asarray(logits), **kw)
    got_tok, got_lp = greedy_rules_argmax(jnp.asarray(logits), **kw)
    np.testing.assert_array_equal(np.asarray(got_tok), np.asarray(ref_tok))
    np.testing.assert_allclose(
        np.asarray(got_lp), np.asarray(ref_lp), rtol=1e-5, atol=1e-5
    )
    assert int(got_tok[0]) >= tb  # forced into the timestamp region
    assert int(got_tok[1]) == 1000

"""Beam-search done-list (harvest) semantics — the Gen-1 reference
rule (models/CaptionModel.py:82-93): eos-ending beams are snapshot
into a done list ranked by RAW summed log-prob, their slot is
recycled, and still-live beams join at the end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from news_image_caption_tpu.generation.generator import (
    GenerationConfig, beam_search)

# Scripted world: vocab 5 (0=pad, 1=bos, 2=eos, 3=b, 4=c).
# From bos: eos scores -0.5, b scores -0.7.
# From b:   eos scores -0.05 (total -0.75), everything else worse.
NEG = -9.0


def scripted_step(tok, i, caches):
    tables = jnp.asarray([
        [NEG, NEG, NEG, NEG, NEG],        # from pad
        [NEG, NEG, -0.5, -0.7, NEG],      # from bos
        [NEG, NEG, NEG, NEG, NEG],        # from eos
        [NEG, NEG, -0.05, NEG, -2.0],     # from b
        [NEG, NEG, -3.0, NEG, NEG],       # from c
    ], jnp.float32)
    return jnp.take(tables, tok, axis=0), caches


def test_harvest_collects_done_beams_by_raw_score():
    cfg = GenerationConfig(max_len=3, beam_size=2, bos_id=1, eos_id=2,
                           pad_id=0, init_finished=False,
                           harvest_finished=True, length_penalty=0.0)
    seed = jnp.asarray([1], jnp.int32)
    caches = {"dummy": jnp.zeros((2, 1))}   # [B*K] rows
    tokens, scores = beam_search(scripted_step, caches, seed, cfg)
    toks = np.asarray(tokens)[0]
    sc = np.asarray(scores)[0]
    # Winner: the beam that finished FIRST with the best raw score
    # ([bos, eos], -0.5) — even though it is the shortest.
    np.testing.assert_array_equal(toks[0], [1, 2, 0, 0])
    np.testing.assert_allclose(sc[0], -0.5, atol=1e-6)
    # Runner-up: the recycled slot explored b then finished
    # ([bos, b, eos], -0.75) — proof the harvested slot freed capacity.
    np.testing.assert_array_equal(toks[1], [1, 3, 2, 0])
    np.testing.assert_allclose(sc[1], -0.75, atol=1e-6)


def test_harvest_early_exit_matches_scan():
    cfg = dict(max_len=3, beam_size=2, bos_id=1, eos_id=2, pad_id=0,
               init_finished=False, harvest_finished=True,
               length_penalty=0.0)
    seed = jnp.asarray([1], jnp.int32)
    caches = {"dummy": jnp.zeros((2, 1))}
    t1, s1 = beam_search(scripted_step, caches, seed,
                         GenerationConfig(**cfg))
    t2, s2 = beam_search(scripted_step, caches, seed,
                         GenerationConfig(early_exit=True, **cfg))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               atol=1e-6)


def test_freeze_mode_keeps_finished_beam_in_slot():
    """Default (harvest off): the finished beam freezes, emits pad,
    and ranks by the length-normalized score."""
    cfg = GenerationConfig(max_len=3, beam_size=2, bos_id=1, eos_id=2,
                           pad_id=0, init_finished=False,
                           length_penalty=0.0)
    seed = jnp.asarray([1], jnp.int32)
    caches = {"dummy": jnp.zeros((2, 1))}
    tokens, scores = beam_search(scripted_step, caches, seed, cfg)
    toks = np.asarray(tokens)[0]
    np.testing.assert_array_equal(toks[0], [1, 2, 0, 0])
    np.testing.assert_allclose(np.asarray(scores)[0, 0], -0.5,
                               atol=1e-6)


def test_beam_init_finished_rows_stay_pad():
    """init_finished: a row whose seed == eos decodes to all-pad on
    the beam path too (previously only generate() honored it)."""
    cfg = GenerationConfig(max_len=3, beam_size=2, bos_id=1, eos_id=2,
                           pad_id=0, init_finished=True)
    seed = jnp.asarray([2, 1], jnp.int32)    # row 0 already terminated
    caches = {"dummy": jnp.zeros((4, 1))}
    tokens, _ = beam_search(scripted_step, caches, seed, cfg)
    toks = np.asarray(tokens)
    assert (toks[0, :, 1:] == 0).all()       # row 0: pad everywhere
    assert (toks[1, 0, 1:] != 0).any()       # row 1 decodes normally

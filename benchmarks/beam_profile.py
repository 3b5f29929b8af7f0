"""Profile the production beam decode step and print top ops by time.

Writes a perfetto trace via jax.profiler, then parses it to aggregate
per-op device time (no TensorBoard needed).

Run: python benchmarks/beam_profile.py [BATCH]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MAX_LEN, BEAM, V = 25, 5, 50265
LOGDIR = "/tmp/beam_profile"


def _cast_bf16(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t)


def main():
    model = ge._flagship(dtype=jnp.bfloat16)
    params = _cast_bf16(jax.jit(model.init)(
        jax.random.PRNGKey(0),
        ge._batch(B=2, T=32, P=49, S=512, image_dim=2048,
                  article_dim=1024, vocab=V)))
    batch = _cast_bf16(ge._batch(B=BATCH, T=32, P=49, S=512,
                                 image_dim=2048, article_dim=1024,
                                 vocab=V, key=1))
    cfg = GenerationConfig(max_len=MAX_LEN, beam_size=BEAM,
                           scan_unroll=1)
    gen = jax.jit(lambda p, b: model.generate_beam(p, b, cfg))
    toks, _ = gen(params, batch)
    np.asarray(toks)  # compile + settle

    with jax.profiler.trace(LOGDIR, create_perfetto_trace=True):
        toks, _ = gen(params, batch)
        np.asarray(toks)

    paths = sorted(glob.glob(LOGDIR + "/**/*.json.gz", recursive=True))
    if not paths:
        print("no perfetto trace found under", LOGDIR)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", trace)
    # Aggregate complete events by name on device tracks.
    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in events:
        if not isinstance(ev, dict) or ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        totals[name] += dur
        counts[name] += 1
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:70]
    total = sum(totals.values())
    print(f"total traced op-time {total:.1f} ms over {MAX_LEN} steps")
    for name, ms in ranked:
        print(f"{ms:9.2f} ms  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()

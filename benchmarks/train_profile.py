"""Profile the flagship train step and aggregate device time by
source line (same recipe as beam_profile.py).

Run: python benchmarks/train_profile.py [BATCH]
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
from benchmarks.flash_train_bench import flagship  # noqa: E402
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    TrainState, make_train_step)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
LOGDIR = "/tmp/train_profile"


def main():
    variant = sys.argv[2] if len(sys.argv) > 2 else "xla"
    use_flash = variant.startswith("flash")
    o2 = variant.endswith("o2")
    model = (flagship(True) if use_flash
             else ge._flagship(dtype=jnp.bfloat16))
    batch = ge._batch(B=BATCH, T=64, P=49, S=512, image_dim=2048,
                      article_dim=1024, vocab=50265)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tx = make_bert_adam(lr=1e-4, t_total=437600, warmup=0.05)

    def loss_fn(p, b, rng):
        return model.loss_fn(p, b, dropout_rng=rng)

    step = make_train_step(loss_fn, tx, donate=True,
                           compute_dtype=jnp.bfloat16, o2_master=o2)
    if o2:
        from news_image_caption_tpu.training.train_step import \
            create_o2_train_state
        state = create_o2_train_state(params, tx)
    else:
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params))
    rng = jax.random.PRNGKey(1)
    state, m = step(state, batch, rng)
    np.asarray(m["loss"])

    with jax.profiler.trace(LOGDIR, create_perfetto_trace=True):
        for _ in range(3):
            state, m = step(state, batch, rng)
        np.asarray(m["loss"])

    paths = sorted(glob.glob(LOGDIR + "/**/*.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", trace)
    by_src = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for ev in events:
        if not isinstance(ev, dict) or ev.get("ph") != "X":
            continue
        a = ev.get("args", {})
        if "hlo_category" not in a:
            continue
        dur = ev.get("dur", 0) / 1e3
        total += dur
        by_cat[a.get("hlo_category", "?")] += dur
        src = a.get("source", "?")
        by_src[src.split("/")[-1]] += dur
    print(f"total device op-time {total:.1f} ms over 3 steps")
    print("-- by HLO category --")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{v:9.2f} ms  {k}")
    print("-- by source line --")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:22]:
        print(f"{v:9.2f} ms  {k}")


if __name__ == "__main__":
    main()

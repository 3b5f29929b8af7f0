"""Signature-compatible entry points for the reference's CLIs.

- `compat.opts.parse_opt` mirrors the Gen-1 argparse surface
  (/root/reference/opts.py:5-147);
- `compat.train` is the `python train.py --flags` driver
  (/root/reference/train.py:30-278);
- `compat.test` is the `final*/test.py`-shaped Gen-2 evaluate driver
  (/root/reference/final/test.py:230-387);
- `compat.eval_utils.eval_split` mirrors eval_utils.eval_split
  (/root/reference/eval_utils.py:249-368).

The flags ARE the public interface being preserved; the machinery
behind them is this repo's JAX stack (Gen1Model, CheckpointStore,
NumPy scorers).
"""

"""Gen-1 CLI flag surface (signature parity with the reference).

Every flag of /root/reference/opts.py:5-147 is accepted with the same
name, type, and semantics, so `python -m news_image_caption_tpu.compat
.train --caption_model show_attend_tell ...` is a drop-in for
`python train.py ...`. Data-path defaults are None here (the reference
hardcodes the author's machine paths); when absent, the driver falls
back to a synthetic dataset so the entry point is runnable anywhere.
"""

from __future__ import annotations

import argparse
from typing import List, Optional


def parse_opt(argv: Optional[List[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Gen-1 news captioner (TPU-native)")
    # Data input settings (opts.py:8-22)
    p.add_argument("--input_json", type=str, default=None)
    p.add_argument("--input_label_h5", type=str, default=None)
    p.add_argument("--input_image_h5", type=str, default=None)
    p.add_argument("--cnn_model", type=str, default="resnet152")
    p.add_argument("--cnn_weight", type=str, default=None)
    p.add_argument("--start_from", type=str, default=None)
    # Model settings (opts.py:24-41)
    p.add_argument("--caption_model", type=str, default="show_attend_tell",
                   help="show_tell | show_attend_tell | all_img | fc | "
                        "att2in | att2in2 | adaatt | adaatt_mo | topdown")
    p.add_argument("--rnn_size", type=int, default=512)
    p.add_argument("--num_layers", type=int, default=1)
    p.add_argument("--rnn_type", type=str, default="lstm")
    p.add_argument("--input_encoding_size", type=int, default=512)
    p.add_argument("--att_hid_size", type=int, default=512)
    p.add_argument("--fc_feat_size", type=int, default=2048)
    p.add_argument("--att_feat_size", type=int, default=2048)
    # Sentence-embedding conditioning (opts.py:43-52)
    p.add_argument("--sentence_embed", type=str, default=None)
    p.add_argument("--sentence_embed_att", type=bool, default=True)
    p.add_argument("--sentence_embed_method", type=str, default="fc",
                   help="fc | fc_max | conv | conv_deep | bnews")
    p.add_argument("--sentence_length", type=int, default=54)
    p.add_argument("--sentence_embed_size", type=int, default=300)
    # Optimization: general (opts.py:54-71)
    p.add_argument("--max_epochs", type=int, default=150)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--grad_clip", type=float, default=5.0)
    p.add_argument("--num_thread", type=int, default=4)
    p.add_argument("--drop_prob_lm", type=float, default=0.2)
    p.add_argument("--finetune_cnn_after", type=int, default=-1)
    p.add_argument("--seq_per_img", type=int, default=1)
    p.add_argument("--beam_size", type=int, default=1)
    # Optimization: for the language model (opts.py:73-97)
    p.add_argument("--optim", type=str, default="adam")
    p.add_argument("--learning_rate", type=float, default=0.002)
    p.add_argument("--learning_rate_decay_start", type=int, default=30)
    p.add_argument("--learning_rate_decay_every", type=int, default=8)
    p.add_argument("--learning_rate_decay_rate", type=float, default=0.8)
    p.add_argument("--optim_alpha", type=float, default=0.8)
    p.add_argument("--optim_beta", type=float, default=0.999)
    p.add_argument("--optim_epsilon", type=float, default=1e-8)
    # Optimization: for the CNN (opts.py:99-110)
    p.add_argument("--cnn_optim", type=str, default="adam")
    p.add_argument("--cnn_optim_alpha", type=float, default=0.8)
    p.add_argument("--cnn_optim_beta", type=float, default=0.999)
    p.add_argument("--cnn_learning_rate", type=float, default=1e-5)
    p.add_argument("--cnn_weight_decay", type=float, default=0)
    # Scheduled sampling (opts.py:112-119)
    p.add_argument("--scheduled_sampling_start", type=int, default=-1)
    p.add_argument("--scheduled_sampling_increase_every", type=int,
                   default=5)
    p.add_argument("--scheduled_sampling_increase_prob", type=float,
                   default=0.05)
    p.add_argument("--scheduled_sampling_max_prob", type=float,
                   default=0.25)
    # Evaluation/checkpointing (opts.py:121-139)
    p.add_argument("--val_images_use", type=int, default=5000)
    p.add_argument("--save_checkpoint_every", type=int, default=1000)
    p.add_argument("--checkpoint_path", type=str, default="save/")
    p.add_argument("--language_eval", type=int, default=1)
    p.add_argument("--losses_log_every", type=int, default=100)
    p.add_argument("--load_best_score", type=int, default=1)
    p.add_argument("--id", type=str, default="")
    p.add_argument("--train_only", type=int, default=0)
    # Extensions kept out of the reference surface (explicit names so
    # they can't collide with reference flags).
    p.add_argument("--tpu_synthetic_size", type=int, default=0,
                   help="use a synthetic dataset of this size when no "
                        "HDF5 inputs are given (0 = require real data)")
    p.add_argument("--tpu_vocab_size", type=int, default=200)
    p.add_argument("--tpu_max_iters", type=int, default=0,
                   help="stop after N iterations (0 = epochs only)")

    args = p.parse_args(argv)

    # Reference validation asserts (opts.py:141-147).
    assert args.rnn_size > 0
    assert args.num_layers > 0
    assert args.input_encoding_size > 0
    assert args.batch_size > 0
    assert 0 <= args.drop_prob_lm < 1
    assert args.beam_size > 0
    assert args.save_checkpoint_every > 0
    assert args.losses_log_every > 0
    return args

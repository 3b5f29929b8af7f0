"""TensorBoard event-file writer (utils/tensorboard.py).

Parity target: the reference's log_to_tensorboard callback
(/root/reference/ttl/expt/goodnews/5_transformer_roberta/config.yaml:
160-163) and Gen-1 tf.summary scalars (/root/reference/train.py:21-28).
"""

import glob
import os

import jax
import pytest

from news_image_caption_tpu.utils.tensorboard import (
    SummaryWriter, crc32c, masked_crc32c, read_events)


def test_crc32c_known_vectors():
    # Standard CRC-32C (Castagnoli) check value.
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # 32 bytes of zeros (rfc3720 appendix B.4 test pattern).
    assert crc32c(bytes(32)) == 0x8A9136AA
    # Masking is invertible modulo 2^32 (rot17 + delta).
    m = masked_crc32c(b"tensorflow")
    crc = crc32c(b"tensorflow")
    unrot = (m - 0xA282EAD8) & 0xFFFFFFFF
    assert ((unrot >> 17) | (unrot << 15)) & 0xFFFFFFFF == crc


def test_event_file_roundtrip(tmp_path):
    logdir = str(tmp_path / "log")
    with SummaryWriter(logdir) as w:
        w.add_scalar("train/loss", 2.5, step=1)
        w.add_scalar("train/loss", 1.25, step=2)
        w.add_scalar("val/bleu", 0.125, step=2)
        path = w.path
    events = read_events(path)  # CRC verified by default
    assert [(e.tag, e.step, e.value) for e in events] == [
        ("train/loss", 1, 2.5),
        ("train/loss", 2, 1.25),
        ("val/bleu", 2, 0.125),
    ]
    assert all(e.wall_time > 0 for e in events)
    assert os.path.basename(path).startswith("events.out.tfevents.")


def test_multi_scalar_event(tmp_path):
    with SummaryWriter(str(tmp_path)) as w:
        w.add_scalars([("a", 1.0), ("b", 2.0)], step=7)
        path = w.path
    events = read_events(path)
    assert {(e.tag, e.value) for e in events} == {("a", 1.0),
                                                  ("b", 2.0)}
    assert all(e.step == 7 for e in events)


def test_corrupt_payload_fails_crc(tmp_path):
    with SummaryWriter(str(tmp_path)) as w:
        w.add_scalar("x", 1.0, step=0)
        path = w.path
    data = bytearray(open(path, "rb").read())
    data[-6] ^= 0xFF  # flip a payload byte of the last record
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="CRC"):
        read_events(path)
    # Verification can be disabled for salvage reads.
    read_events(path, verify_crc=False)


def test_trainer_writes_tensorboard_scalars(tmp_path):
    from news_image_caption_tpu.config import (build_dataset, build_model,
                                               build_optimizer, load_config)
    from news_image_caption_tpu.data.loader import DeviceLoader
    from news_image_caption_tpu.training.train_step import \
        create_train_state
    from news_image_caption_tpu.training.trainer import (Trainer,
                                                         TrainerConfig)

    tiny = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "tiny_test.yaml")
    cfg = load_config(tiny)
    model = build_model(cfg)
    train_ds = build_dataset(cfg, "train")
    val_ds = build_dataset(cfg, "val")
    tx = build_optimizer(cfg)
    batch = next(train_ds.batches(4))
    params = model.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(params, tx)

    tconf = TrainerConfig(num_epochs=1, serialization_dir=str(tmp_path),
                          log_every=2, summary_interval=1)
    trainer = Trainer(model.loss_fn, tx, tconf)
    trainer.train(
        state,
        lambda e: DeviceLoader(train_ds.batches(4, seed=e)),
        lambda e: DeviceLoader(val_ds.batches(4, shuffle=False)))

    files = glob.glob(os.path.join(str(tmp_path), "log",
                                   "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0])
    tags = {e.tag for e in events}
    assert "train/loss" in tags
    assert "validation/loss" in tags
    # Scalar values are finite floats at increasing steps.
    steps = [e.step for e in events if e.tag == "train/loss"]
    assert steps == sorted(steps)

"""TensorBoard scalar event writer: round-trip + cross-validation against
the real tensorboard reader (SURVEY §5 logging gap, VERDICT missing #5)."""

import glob
import os

import numpy as np
import pytest

from classifying_vae_lstm_tpu.utils.tb_events import (
    ScalarEventWriter,
    crc32c,
    jsonl_to_tb,
    read_scalar_events,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_scalar_events_roundtrip(tmp_path):
    w = ScalarEventWriter(str(tmp_path))
    w.add_scalars(0, {"loss": 12.5, "val_loss": 13.25})
    w.add_scalars(1, {"loss": 10.0, "val_loss": 11.0, "w_acc": 0.75})
    w.close()
    events = read_scalar_events(w.path)
    assert [e[0] for e in events] == [0, 1]
    np.testing.assert_allclose(events[0][1]["loss"], 12.5)
    np.testing.assert_allclose(events[1][1]["w_acc"], 0.75)


def test_scalar_events_readable_by_real_tensorboard(tmp_path):
    """The files must parse with tensorboard's own event loader."""
    try:
        from tensorboard.backend.event_processing.event_file_loader import (
            LegacyEventFileLoader,
        )
    except Exception:
        pytest.skip("tensorboard not importable")
    w = ScalarEventWriter(str(tmp_path))
    w.add_scalars(3, {"loss": 42.0})
    w.close()
    events = list(LegacyEventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"
    scalar_events = [e for e in events if e.summary.value]
    assert scalar_events[0].step == 3
    assert scalar_events[0].summary.value[0].tag == "loss"
    np.testing.assert_allclose(scalar_events[0].summary.value[0].simple_value, 42.0)


def test_jsonl_to_tb_converter(tmp_path):
    jl = tmp_path / "run.jsonl"
    jl.write_text('{"epoch": 0, "loss": 5.0, "note": "skip-me"}\n'
                  '{"epoch": 1, "loss": 4.0}\n')
    path = jsonl_to_tb(str(jl), str(tmp_path / "tb"))
    events = read_scalar_events(path)
    assert [e[0] for e in events] == [0, 1]
    assert "note" not in events[0][1]
    np.testing.assert_allclose(events[1][1]["loss"], 4.0)


def test_do_log_writes_tb_events(tmp_path, jsb_cs_path):
    """--do_log end to end: train 1 epoch, find the event file, parse it."""
    from classifying_vae_lstm_tpu.cli import cl_vae_train

    args = cl_vae_train.build_parser().parse_args([
        "tbe", "--num_epochs", "1", "--patience", "0", "--do_log",
        "--model_dir", str(tmp_path), "--log_dir", str(tmp_path / "logs"),
        "--train_file", jsb_cs_path,
    ])
    cl_vae_train.train(args)
    assert os.path.exists(tmp_path / "logs" / "tbe.jsonl")
    files = glob.glob(str(tmp_path / "logs" / "tbe" / "events.out.tfevents.*"))
    assert files, "no TB event file written under --do_log"
    events = read_scalar_events(files[0])
    assert events and "loss" in events[0][1] and "val_loss" in events[0][1]


def test_reader_rejects_truncated_and_corrupt(tmp_path):
    w = ScalarEventWriter(str(tmp_path))
    w.add_scalars(0, {"loss": 1.0})
    w.close()
    data = open(w.path, "rb").read()
    trunc = tmp_path / "trunc.tfevents"
    trunc.write_bytes(data[:-7])  # chop mid-record
    with pytest.raises(ValueError):
        read_scalar_events(str(trunc))
    corrupt = tmp_path / "bad.tfevents"
    corrupt.write_bytes(data[:20] + bytes([data[20] ^ 0xFF]) + data[21:])
    with pytest.raises(ValueError):
        read_scalar_events(str(corrupt))

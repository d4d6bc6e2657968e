import struct

from subgnn_tpu.train.tb_writer import TBWriter, _masked_crc


def read_records(path):
    """Parse TFRecord framing, verifying both CRCs."""
    records = []
    data = path.read_bytes()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (hcrc,) = struct.unpack_from("<I", data, off + 8)
        assert hcrc == _masked_crc(data[off:off + 8])
        payload = data[off + 12:off + 12 + length]
        (pcrc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert pcrc == _masked_crc(payload)
        records.append(payload)
        off += 12 + length + 4
    return records


def test_tb_writer_framing(tmp_path):
    w = TBWriter(tmp_path)
    w.add_scalar("val_micro_f1", 0.75, step=3)
    w.add_scalars({"val_acc": 0.5, "epoch": 3, "skip": "str"}, step=3)
    w.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    records = read_records(files[0])
    # file_version + 3 numeric scalars ("skip" is non-numeric)
    assert len(records) == 4
    assert b"brain.Event:2" in records[0]
    assert b"val_micro_f1" in records[1]
    assert b"val_acc" in records[2]


def test_tb_readable_by_tensorboard_if_available(tmp_path):
    try:
        from tensorboard.backend.event_processing import event_file_loader
    except ImportError:
        import pytest
        pytest.skip("tensorboard not installed")
    w = TBWriter(tmp_path)
    w.add_scalar("loss", 1.25, step=7)
    w.close()
    f = list(tmp_path.glob("events.out.tfevents.*"))[0]
    events = list(event_file_loader.EventFileLoader(str(f)).Load())
    scalar_events = [e for e in events if e.summary.value]
    assert scalar_events
    v = scalar_events[0].summary.value[0]
    assert v.tag == "loss"
    # the loader may normalize simple_value into a tensor proto
    val = (v.simple_value if v.simple_value
           else v.tensor.float_val[0])
    assert abs(val - 1.25) < 1e-6
    assert scalar_events[0].step == 7

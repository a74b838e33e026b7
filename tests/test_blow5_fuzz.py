"""Robustness fuzzing of the BLOW5 parser: truncations, bit flips, and
garbage must produce clean Python exceptions -- never hangs, crashes of
the native decoder, or silently wrong data. (The C reference's
philosophy is fail-fast exit(1) on IO errors, SURVEY §5; a framework
embedded as a library must fail with catchable errors instead.)"""

from __future__ import annotations

import numpy as np
import pytest

from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer


@pytest.fixture(scope="module")
def good_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    p = str(d / "good.blow5")
    rng = np.random.default_rng(0)
    with Slow5Writer(p, header_data=[{"experiment_type": "genomic_dna"}]) as w:
        for i in range(8):
            w.write_record(
                Slow5Record(
                    read_id=f"r{i}", read_group=0, digitisation=8192.0,
                    offset=3.0, range=1400.0, sampling_rate=4000.0,
                    raw_signal=rng.integers(-800, 800, 1500).astype(np.int16),
                )
            )
    return p


def _consume(path: str) -> int:
    n = 0
    with Slow5File(path) as sf:
        while True:
            blob = sf.read_next_blob()
            if blob is None:
                break
            rec = sf.decode_record(blob)
            assert rec.raw_signal.dtype == np.int16
            n += 1
    return n


def test_baseline(good_file):
    assert _consume(good_file) == 8


def test_truncations(good_file, tmp_path):
    """Every prefix of the file either parses a prefix of the records or
    raises a clean error -- never hangs or returns malformed records."""
    data = open(good_file, "rb").read()
    rng = np.random.default_rng(1)
    cuts = sorted(set(rng.integers(0, len(data), 60).tolist()) | {0, 1, 67, 68})
    for cut in cuts:
        p = str(tmp_path / "t.blow5")
        with open(p, "wb") as f:
            f.write(data[:cut])
        try:
            n = _consume(p)
            assert 0 <= n <= 8
        except (ValueError, IOError, OSError, EOFError, struct_err):
            pass


import struct

struct_err = struct.error


def test_bit_flips(good_file, tmp_path):
    """Random single-byte corruptions: parse a subset, or raise cleanly.
    zlib checksums catch most record corruption; header corruption must
    error, not misparse silently into garbage signals."""
    data = bytearray(open(good_file, "rb").read())
    rng = np.random.default_rng(2)
    for trial in range(60):
        pos = int(rng.integers(0, len(data)))
        old = data[pos]
        data[pos] = int(rng.integers(0, 256))
        p = str(tmp_path / "b.blow5")
        with open(p, "wb") as f:
            f.write(bytes(data))
        try:
            _consume(p)
        except (ValueError, IOError, OSError, EOFError, MemoryError,
                struct_err, UnicodeDecodeError, KeyError):
            pass
        finally:
            data[pos] = old


def test_garbage_and_empty(tmp_path):
    for name, blob in (
        ("empty.blow5", b""),
        ("short.blow5", b"BL"),
        ("wrongmagic.blow5", b"NOTBLOW5" + b"\x00" * 100),
        ("random.blow5", np.random.default_rng(3).bytes(4096)),
    ):
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(blob)
        with pytest.raises((ValueError, IOError, OSError, struct_err)):
            _consume(p)


def test_svb_truncated_signal(tmp_path):
    """A record whose svb-zd blob claims more values than its data holds
    must raise, not read out of bounds (both native and Python paths)."""
    import struct as st
    import zlib

    from sigfish_tpu.io.blow5 import svb_zd_encode

    sig = np.arange(500, dtype=np.int16)
    enc = bytearray(svb_zd_encode(sig))
    st.pack_into("<I", enc, 0, 5000)  # lie about the count
    body = st.pack("<H", 1) + b"x" + st.pack("<I", 0)
    body += st.pack("<dddd", 8192.0, 0.0, 1400.0, 4000.0)
    body += st.pack("<Q", len(enc)) + bytes(enc)
    blob = zlib.compress(body)
    p = str(tmp_path / "lie.blow5")
    with Slow5Writer(p, header_data=[{}]) as w:
        pass  # header only
    with open(p, "r+b") as f:
        f.seek(0, 2)
        f.seek(f.tell() - 5)  # overwrite the EOF marker
        f.write(st.pack("<Q", len(blob)) + blob + b"5WOLB")
    with Slow5File(p) as sf:
        b = sf.read_next_blob()
        assert b is not None
        import os

        os.environ["SIGFISH_TPU_NO_NATIVE"] = "1"
        try:
            with pytest.raises((ValueError, IOError)):
                sf.decode_record(b)
        finally:
            os.environ.pop("SIGFISH_TPU_NO_NATIVE", None)
        # native path: must return a clean failure or raise -- never a
        # wrong-sized signal
        try:
            rec = sf.decode_record(b)
            assert rec.raw_signal.size == 5000  # only if it padded safely
        except (ValueError, IOError):
            pass


def test_pre_0_2_header_no_signal_press_byte(tmp_path):
    """BLOW5 < 0.2.0 has no signal-press header byte (slow5lib reads it
    only for >= 0.2.0, slow5.c:824): byte 14 is padding there and must
    be ignored even if nonzero, with signal compression defaulting to
    none."""
    p = str(tmp_path / "old.blow5")
    rng = np.random.default_rng(3)
    sigs = [rng.integers(-800, 800, 700).astype(np.int16) for _ in range(3)]
    with Slow5Writer(
        p,
        header_data=[{"experiment_type": "genomic_dna"}],
        rec_press="zlib",
        sig_press="none",
    ) as w:
        for i, s in enumerate(sigs):
            w.write_record(
                Slow5Record(
                    read_id=f"r{i}", read_group=0, digitisation=8192.0,
                    offset=3.0, range=1400.0, sampling_rate=4000.0,
                    raw_signal=s,
                )
            )
    buf = bytearray(open(p, "rb").read())
    buf[6:9] = bytes([0, 1, 2])  # version 0.1.2
    buf[14] = 0xEE  # padding in 0.1.x; a 0.2 parser would reject it
    open(p, "wb").write(bytes(buf))

    with Slow5File(p) as sf:
        assert sf.version == (0, 1, 2)
        assert sf.sig_press == "none"
        recs = list(sf)
    assert len(recs) == 3
    for r, s in zip(recs, sigs):
        assert np.array_equal(r.raw_signal, s)

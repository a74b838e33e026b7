"""BLOW5 reader tests against the in-repo reference test files.

ref: slow5lib read path (slow5.c:792-880 header, :3191 records,
slow5_press.c:1054-1078 svb-zd signal codec).
"""

import numpy as np
import pytest

from sigfish_tpu.io.blow5 import Slow5File, svb_zd_decode, svb_zd_encode

DNA = "/root/reference/test/sp1_dna.blow5"
RNA = "/root/reference/test/sequin_rna.blow5"


def test_dna_file_header():
    sf = Slow5File(DNA)
    assert sf.header_get("experiment_type", 0) in (None, "genomic_dna")
    sf.close()


def test_dna_records():
    sf = Slow5File(DNA)
    recs = list(sf)
    sf.close()
    assert len(recs) == 5
    ids = {r.read_id for r in recs}
    assert "007bdb7e-c5b5-4c4e-974c-52aa61a18039" in ids
    for r in recs:
        assert r.len_raw_signal == r.raw_signal.size
        assert r.raw_signal.dtype == np.int16
        pa = r.to_pa()
        assert pa.dtype == np.float32
        # pA conversion (raw+offset)*range/digitisation stays in a sane range
        assert 0 < np.median(pa) < 300


def test_rna_records():
    sf = Slow5File(RNA)
    recs = list(sf)
    sf.close()
    assert len(recs) == 8
    assert sf.header_get("experiment_type", 0) == "rna"


def test_svb_zd_roundtrip():
    rng = np.random.default_rng(42)
    for n in (0, 1, 3, 4, 5, 100, 1023):
        sig = rng.integers(-3000, 3000, size=n).astype(np.int16)
        enc = svb_zd_encode(sig)
        dec = svb_zd_decode(np.frombuffer(enc, dtype=np.uint8))
        np.testing.assert_array_equal(dec[:n], sig)


def test_read_batch_bounds():
    sf = Slow5File(DNA)
    blobs = sf.read_batch(3, 10**9)
    assert len(blobs) == 3
    blobs2 = sf.read_batch(512, 10**9)
    assert len(blobs2) == 2  # remaining
    sf.close()


def test_ascii_slow5_roundtrip(tmp_path):
    from sigfish_tpu.io.blow5 import Slow5Writer

    src = Slow5File(DNA)
    recs = list(src)
    hdr = src.header_data
    src.close()
    p = tmp_path / "t.slow5"
    with Slow5Writer(str(p), header_data=hdr) as w:
        for r in recs:
            w.write_record(r)
    rb = Slow5File(str(p))
    assert rb.format == "ascii"
    recs2 = list(rb)
    assert rb.header_get("sequencing_kit", 0) == "sqk-lsk109"
    rb.close()
    assert len(recs2) == len(recs)
    for a, b in zip(recs, recs2):
        assert a.read_id == b.read_id
        assert a.digitisation == b.digitisation
        assert a.sampling_rate == b.sampling_rate
        np.testing.assert_array_equal(a.raw_signal, b.raw_signal)


def test_binary_blow5_roundtrip(tmp_path):
    from sigfish_tpu.io.blow5 import Slow5Writer

    src = Slow5File(RNA)
    recs = list(src)
    hdr = src.header_data
    src.close()
    p = tmp_path / "t.blow5"
    with Slow5Writer(str(p), header_data=hdr) as w:
        for r in recs:
            w.write_record(r)
    rb = Slow5File(str(p))
    recs2 = list(rb)
    rb.close()
    assert len(recs2) == len(recs)
    for a, b in zip(recs, recs2):
        assert a.read_id == b.read_id
        np.testing.assert_array_equal(a.raw_signal, b.raw_signal)


def test_zstd_record_roundtrip(tmp_path):
    zstd = pytest.importorskip("zstandard")
    from sigfish_tpu.io.blow5 import Slow5Writer

    src = Slow5File(DNA)
    recs = list(src)
    hdr = src.header_data
    src.close()
    p = tmp_path / "z.blow5"
    with Slow5Writer(str(p), header_data=hdr, rec_press="zstd") as w:
        for r in recs:
            w.write_record(r)
    rb = Slow5File(str(p))
    assert rb.rec_press == "zstd"
    recs2 = list(rb)
    rb.close()
    assert len(recs2) == len(recs)
    for a, b in zip(recs, recs2):
        assert a.read_id == b.read_id
        np.testing.assert_array_equal(a.raw_signal, b.raw_signal)


# ------------------------------------------------------------------ index
# ref: slow5_idx.c (build :183, write :356, read :407), format
# slow5_idx.h:20-24. The mapper never uses the index (SURVEY §2.2) --
# these cover the random-access API surface (slow5_get / slow5_idx_load).


def test_index_build_write_load_roundtrip(tmp_path):
    from sigfish_tpu.io.blow5_idx import INDEX_EOF, INDEX_MAGIC, Slow5Index

    sf = Slow5File(DNA)
    idx = Slow5Index.build(sf)
    recs = list(sf)  # build must not disturb the stream position
    assert len(recs) == 5
    assert len(idx) == 5
    p = tmp_path / "t.idx"
    idx.write(str(p))
    raw = p.read_bytes()
    assert raw[: len(INDEX_MAGIC)] == INDEX_MAGIC
    assert raw[9:12] == bytes(sf.version)
    assert raw.endswith(INDEX_EOF)
    idx2 = Slow5Index.load(str(p))
    assert idx2.ids() == idx.ids()
    for rid in idx.ids():
        assert idx2.get(rid) == idx.get(rid)
    sf.close()


def test_index_random_access_binary(tmp_path):
    import shutil

    # copy: index_load writes the .idx sidecar next to the file
    p = tmp_path / "dna.blow5"
    shutil.copy(DNA, p)
    sf = Slow5File(str(p))
    seq = {r.read_id: r for r in sf}
    for rid, want in seq.items():
        got = sf.get(rid)
        assert got is not None
        assert got.read_id == rid
        assert got.read_group == want.read_group
        np.testing.assert_array_equal(got.raw_signal, want.raw_signal)
    assert sf.get("no-such-read") is None
    assert (tmp_path / "dna.blow5.idx").exists()
    sf.close()
    # a second open must load the sidecar, not rebuild
    sf2 = Slow5File(str(p))
    idx = sf2.index_load()
    assert len(idx) == len(seq)
    r0 = next(iter(seq))
    np.testing.assert_array_equal(sf2.get(r0).raw_signal, seq[r0].raw_signal)
    sf2.close()


def test_index_random_access_ascii(tmp_path):
    from sigfish_tpu.io.blow5 import Slow5Writer

    src = Slow5File(RNA)
    recs = list(src)
    hdr = src.header_data
    src.close()
    p = tmp_path / "t.slow5"
    with Slow5Writer(str(p), header_data=hdr) as w:
        for r in recs:
            w.write_record(r)
    sf = Slow5File(str(p))
    mid = recs[len(recs) // 2]
    got = sf.get(mid.read_id)
    np.testing.assert_array_equal(got.raw_signal, mid.raw_signal)
    # interleave random access with sequential streaming
    first = sf.decode_record(sf.read_next_blob())
    assert first.read_id == recs[0].read_id
    got2 = sf.get(recs[-1].read_id)
    np.testing.assert_array_equal(got2.raw_signal, recs[-1].raw_signal)
    second = sf.decode_record(sf.read_next_blob())
    assert second.read_id == recs[1].read_id
    sf.close()


def test_index_to_explicit_path(tmp_path):
    from sigfish_tpu.io.blow5_idx import Slow5Index

    sf = Slow5File(RNA)
    p = tmp_path / "explicit.idx"
    sf.index_to(str(p))
    idx = Slow5Index.load(str(p))
    assert len(idx) == 8
    # offsets must point at real records: fetch one by hand
    rid = idx.ids()[3]
    off, size = idx.get(rid)
    import struct as _struct

    sf._fp.seek(off)
    (sz,) = _struct.unpack("<Q", sf._fp.read(8))
    assert sz == size - 8
    rec = sf.decode_record(sf._fp.read(sz))
    assert rec.read_id == rid
    sf.close()


def test_native_decode_random_roundtrip(tmp_path):
    """Random signals through Slow5Writer (zlib + svb-zd) and back via the
    native decoder -- exercises the SIMD streamvbyte fast path across all
    code-length mixes, group tails (n % 4), and empty signals."""
    from sigfish_tpu.io.blow5 import Slow5Record, Slow5Writer

    rng = np.random.default_rng(7)
    sigs = []
    for _ in range(50):
        n = int(rng.integers(0, 3000))
        mag = int(rng.choice([5, 200, 20000, 32767]))
        sigs.append(rng.integers(-mag, mag, size=n).astype(np.int16))
    p = str(tmp_path / "stress.blow5")
    with Slow5Writer(p, header_data=[{"experiment_type": "genomic_dna"}]) as w:
        for i, s in enumerate(sigs):
            w.write_record(
                Slow5Record(
                    read_id=f"r{i}",
                    read_group=0,
                    digitisation=8192.0,
                    offset=0.0,
                    range=1400.0,
                    sampling_rate=4000.0,
                    raw_signal=s,
                )
            )
    with Slow5File(p) as sf:
        for i, rec in enumerate(sf):
            np.testing.assert_array_equal(rec.raw_signal, sigs[i])


def _mkrec(i, sig, **kw):
    from sigfish_tpu.io.blow5 import Slow5Record

    return Slow5Record(
        read_id=f"r{i}", read_group=0, digitisation=8192.0, offset=3.0,
        range=1400.0, sampling_rate=4000.0,
        raw_signal=np.asarray(sig, dtype=np.int16), **kw,
    )


AUX_META = [
    ("start_time", "uint64_t"),
    ("read_number", "int32_t"),
    ("start_mux", "uint8_t"),
    ("median_before", "double"),
    ("end_reason", "enum{unknown,partial,mux_change}"),
    ("channel_number", "char*"),
    ("extra_levels", "float*"),
]


@pytest.mark.parametrize("fmt,ext", [("binary", "blow5"), ("ascii", "slow5")])
def test_aux_roundtrip(tmp_path, fmt, ext):
    """Aux columns write + parse back (ref slow5.c:3084-3184): typed
    primitives, NULL sentinels for missing, strings and float arrays."""
    from sigfish_tpu.io.blow5 import Slow5Writer

    p = str(tmp_path / f"aux.{ext}")
    aux_full = {
        "start_time": 34915692,
        "read_number": 11649,
        "start_mux": 1,
        "median_before": 201.48167419433594,
        "end_reason": 2,
        "channel_number": "238",
        "extra_levels": np.array([1.5, -2.25], dtype=np.float32),
    }
    aux_missing = {k: None for k in aux_full}
    with Slow5Writer(p, header_data=[{"run_id": "x"}], aux_meta=AUX_META) as w:
        w.write_record(_mkrec(0, [1, 2, 3], aux=aux_full))
        w.write_record(_mkrec(1, [4, 5], aux=aux_missing))
        w.write_record(_mkrec(2, [6]))  # rec.aux is None -> all missing
    with Slow5File(p) as sf:
        assert sf.aux_meta == AUX_META
        blobs = [sf.read_next_blob() for _ in range(3)]
        r0 = sf.decode_record(blobs[0], with_aux=True)
        assert r0.aux_get("start_time") == 34915692
        assert r0.aux_get("read_number") == 11649
        assert r0.aux_get("start_mux") == 1
        assert r0.aux_get("median_before") == 201.48167419433594
        assert r0.aux_get("end_reason") == 2
        assert r0.aux_get("channel_number") == "238"
        np.testing.assert_array_equal(
            r0.aux_get("extra_levels"), np.array([1.5, -2.25], dtype=np.float32)
        )
        for b in blobs[1:]:
            r = sf.decode_record(b, with_aux=True)
            assert all(v is None for v in r.aux.values()), r.aux
            # and the fast path (no aux) still decodes the signal
            assert sf.decode_record(b).aux is None


def test_aux_real_reference_file():
    """The in-repo sp1 file carries the 6 standard aux fields."""
    with Slow5File("/root/reference/test/sp1_dna.blow5") as sf:
        names = [n for n, _ in sf.aux_meta]
        assert {"channel_number", "median_before", "read_number",
                "start_mux", "start_time"} <= set(names)
        rec = sf.decode_record(sf.read_next_blob(), with_aux=True)
        assert rec.aux_get("channel_number") == "238"
        assert rec.aux_get("start_mux") == 1
        assert isinstance(rec.aux_get("median_before"), float)


def test_signal_press_dev_codes(tmp_path):
    """Signal-press bytes 250 (zlib) / 251 (zstd) are slow5lib hidden dev
    codes (slow5_press.c:100-148); unknown bytes must error cleanly."""
    from sigfish_tpu.io.blow5 import Slow5Writer

    sig = np.arange(-500, 500, dtype=np.int16)
    p = str(tmp_path / "sigzlib.blow5")
    with Slow5Writer(p, sig_press="zlib") as w:
        w.write_record(_mkrec(0, sig))
    raw = bytearray(open(p, "rb").read())
    assert raw[14] == 250  # signal-press byte position in the fixed header
    with Slow5File(p) as sf:
        assert sf.sig_press == "zlib"
        np.testing.assert_array_equal(next(iter(sf)).raw_signal, sig)

    # unknown signal-press byte -> hard error, never a garbage decode
    raw[14] = 77
    bad = tmp_path / "bad.blow5"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="signal compression"):
        Slow5File(str(bad))


def test_header_missing_dot_semantics(tmp_path):
    """'.' header values parse to empty string exactly like slow5lib
    (slow5.c:1746-1749) and serialize back to '.'."""
    from sigfish_tpu.io.blow5 import Slow5Writer

    p = str(tmp_path / "dot.blow5")
    with Slow5Writer(p, header_data=[{"asic_id": "42", "exp": ""}]) as w:
        w.write_record(_mkrec(0, [1, 2]))
    with Slow5File(p) as sf:
        assert sf.header_get("asic_id") == "42"
        assert sf.header_get("exp") == ""          # "." -> empty string
        assert sf.header_get("nonexistent") is None  # absent -> None
        assert sf.header_get("asic_id", read_group=5) is None


def test_read_id_of_matches_decode(tmp_path):
    """Index builds parse only the read_id -- must agree with the full
    decode on every record of the real test files."""
    for path in (DNA, RNA):
        with Slow5File(path) as sf:
            while True:
                blob = sf.read_next_blob()
                if blob is None:
                    break
                assert sf.read_id_of(blob) == sf.decode_record(blob).read_id


def test_index_write_is_atomic(tmp_path):
    """Concurrent multi-host startup races to create the sidecar: a
    reader must never see a partial file, so write() goes through a
    temp file + rename and leaves no droppings."""
    import os
    import shutil

    p = tmp_path / "dna.blow5"
    shutil.copy(DNA, p)
    with Slow5File(str(p)) as sf:
        idx = sf.index_load()
    files = os.listdir(tmp_path)
    assert "dna.blow5.idx" in files
    assert not [f for f in files if ".tmp." in f]
    from sigfish_tpu.io.blow5_idx import Slow5Index

    loaded = Slow5Index.load(str(p) + ".idx")
    assert loaded.ids() == idx.ids()


def test_native_decode_rejects_short_svb_blob():
    """A crafted uncompressed record whose svb count field promises more
    data than the blob carries must fail cleanly (no over-read)."""
    import struct as _struct

    from sigfish_tpu import native

    rid = b"r1"
    head = (
        _struct.pack("<H", len(rid)) + rid + _struct.pack("<I", 0)
        + _struct.pack("<dddd", 8192.0, 0.0, 1400.0, 4000.0)
    )
    # len_raw=4 (byte count when signal-compressed) but count=1000:
    # the 4-byte "signal" field holds only the count header itself
    blob = head + _struct.pack("<Q", 4) + _struct.pack("<I", 1000)
    assert native.blow5_decode(blob, "none", "svb-zd") is None
    # and the Python path must also reject it
    import pytest as _pytest

    from sigfish_tpu.io import blow5 as _b5

    with _pytest.raises(Exception):
        sig = _b5._decode_signal(
            np.frombuffer(blob[-4:], np.uint8), "svb-zd"
        )
        assert sig.size == 1000  # unreachable unless decode over-read


def test_char_aux_empty_and_none_roundtrip(tmp_path):
    """char aux must always occupy exactly one byte: None and '' both
    map to the SLOW5_CHAR_NULL sentinel and read back as None, and the
    fields AFTER the char stay aligned."""
    from sigfish_tpu.io.blow5 import Slow5Record, Slow5Writer

    p = str(tmp_path / "c.blow5")
    meta = [("ch", "char"), ("median_before", "double")]
    with Slow5Writer(p, header_data=[{}], aux_meta=meta) as w:
        for i, ch in enumerate([None, "", "A"]):
            w.write_record(
                Slow5Record(
                    read_id=f"r{i}", read_group=0, digitisation=8192.0,
                    offset=0.0, range=1400.0, sampling_rate=4000.0,
                    raw_signal=np.arange(4, dtype=np.int16),
                    aux={"ch": ch, "median_before": 5.5},
                )
            )
    with Slow5File(p) as sf:
        recs = [sf.decode_record(b, with_aux=True) for b in iter(sf.read_next_blob, None)]
    assert [r.aux["ch"] for r in recs] == [None, None, "A"]
    assert all(r.aux["median_before"] == 5.5 for r in recs)


@pytest.mark.parametrize("rec_press", ["none", "zlib", "zstd"])
@pytest.mark.parametrize("sig_press", ["none", "svb-zd", "zlib", "zstd"])
def test_press_matrix_native_decode(tmp_path, rec_press, sig_press):
    """Every binary press combination decodes through the NATIVE decoder
    (record none/zlib/zstd x signal none/svb-zd + dev codes 250/251,
    slow5_press.c:76-148) and matches the pure-Python parse of the same
    blob bit for bit."""
    from sigfish_tpu import native
    from sigfish_tpu.io.blow5 import Slow5Writer

    rng = np.random.default_rng(11)
    sigs = [
        rng.integers(-m, m, size=int(rng.integers(0, 2000))).astype(np.int16)
        for m in (5, 30000, 700, 1)
    ]
    p = str(tmp_path / f"m_{rec_press}_{sig_press}.blow5")
    with Slow5Writer(p, rec_press=rec_press, sig_press=sig_press) as w:
        for i, s in enumerate(sigs):
            w.write_record(_mkrec(i, s))
    with Slow5File(p) as sf:
        assert sf.rec_press == rec_press and sf.sig_press == (
            sig_press if sig_press != "none" else "none"
        )
        blobs = sf.read_batch(100, 1 << 30)
        assert len(blobs) == len(sigs)
        for i, blob in enumerate(blobs):
            if native.available():
                # the native path must actually serve this combo
                res = native.blow5_decode(blob, sf.rec_press, sf.sig_press)
                assert res is not None, (rec_press, sig_press)
            rec_n = sf.decode_record(blob)             # native when built
            rec_p = sf.decode_record(blob, with_aux=True)  # python parse
            for rec in (rec_n, rec_p):
                assert rec.read_id == f"r{i}"
                assert rec.digitisation == 8192.0 and rec.offset == 3.0
                np.testing.assert_array_equal(rec.raw_signal, sigs[i])

"""Property fuzz: random aux schemas x random values x every
compression combo must round-trip exactly through the writer + parser.

The aux layer is the slow5lib-interop surface (slow5.c:2806+ read,
:792-880 header write); corruption here is silent (fields shift), so a
randomized round-trip is the right safety net -- the fixed aux tests
only cover the 5 standard fields.
"""

from __future__ import annotations

import numpy as np
import pytest

from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer

_PRIMS = [
    "int8_t", "int16_t", "int32_t", "int64_t",
    "uint8_t", "uint16_t", "uint32_t", "uint64_t",
    "float", "double", "char",
]
_INT_RANGE = {
    "int8_t": (-128, 126), "int16_t": (-32768, 32766),
    "int32_t": (-(2**31), 2**31 - 2), "int64_t": (-(2**63), 2**63 - 2),
    "uint8_t": (0, 254), "uint16_t": (0, 65534),
    "uint32_t": (0, 2**32 - 2), "uint64_t": (0, 2**64 - 2),
}


def _random_schema(rng: np.random.Generator) -> list[tuple[str, str]]:
    n = int(rng.integers(1, 7))
    meta = []
    for i in range(n):
        t = _PRIMS[int(rng.integers(0, len(_PRIMS)))]
        if t == "uint8_t" and rng.random() < 0.3:
            t = "enum{unknown,partial,complete}"
        elif t != "char" and rng.random() < 0.35:
            t += "*"
        elif t == "char" and rng.random() < 0.3:
            t += "*"  # char* = string
        meta.append((f"f{i}", t))
    return meta


def _random_value(rng: np.random.Generator, tstr: str):
    if rng.random() < 0.15:
        return None  # missing
    if tstr.endswith("*"):
        base = tstr[:-1]
        if base == "char":
            n = int(rng.integers(0, 12))
            return "".join(
                chr(int(rng.integers(33, 126))) for _ in range(n)
            )
        n = int(rng.integers(0, 9))
        if base in ("float", "double"):
            dt = "<f4" if base == "float" else "<f8"
            return rng.standard_normal(n).astype(dt)
        lo, hi = _INT_RANGE[base]
        dt = {"int8_t": np.int8, "int16_t": np.int16, "int32_t": np.int32,
              "int64_t": np.int64, "uint8_t": np.uint8,
              "uint16_t": np.uint16, "uint32_t": np.uint32,
              "uint64_t": np.uint64}[base]
        return rng.integers(lo, hi, size=n, dtype=dt)
    if tstr.startswith("enum"):
        return int(rng.integers(0, 3))
    if tstr in ("float", "double"):
        return float(np.float32(rng.standard_normal()))
    if tstr == "char":
        return chr(int(rng.integers(33, 126)))
    lo, hi = _INT_RANGE[tstr]
    return int(rng.integers(lo, hi, dtype=np.uint64 if lo == 0 else np.int64))


def _expect(tstr: str, v):
    """What the parser should hand back for a written value.

    Zero-length arrays/strings read back as None: the binary format
    encodes missing as length 0 (slow5lib cannot distinguish them
    either -- slow5.c aux read path)."""
    if v is None:
        return None
    if tstr.endswith("*") and len(v) == 0:
        return None
    if tstr.endswith("*") and tstr != "char*":
        return np.asarray(v)
    if tstr == "float":
        return float(np.float32(v))
    if tstr == "double":
        return float(v)
    return v


def test_aux_roundtrip_fuzz_ascii(tmp_path):
    """Same property through the ASCII .slow5 format: '.' means missing,
    and zero-length arrays/strings ('' chars too) write as '.' so every
    column stays parseable."""
    rng = np.random.default_rng(99)
    for trial in range(8):
        meta = _random_schema(rng)
        p = str(tmp_path / f"a{trial}.slow5")
        recs = []
        with Slow5Writer(p, header_data=[{}], aux_meta=meta) as w:
            for i in range(3):
                aux = {name: _random_value(rng, t) for name, t in meta}
                r = Slow5Record(
                    read_id=f"r{i}", read_group=0, digitisation=8192.0,
                    offset=0.0, range=1400.0, sampling_rate=4000.0,
                    raw_signal=rng.integers(-50, 50, 8).astype(np.int16),
                    aux=aux,
                )
                recs.append(aux)
                w.write_record(r)
        with Slow5File(p) as sf:
            got = [
                sf.decode_record(b, with_aux=True)
                for b in iter(sf.read_next_blob, None)
            ]
        for aux, rec in zip(recs, got):
            for name, t in meta:
                exp = _expect(t, aux[name])
                v = rec.aux[name]
                if t == "char" and exp == "":
                    exp = None  # '' char == missing, like binary
                if exp is None:
                    assert v is None, (t, name, v)
                elif isinstance(exp, np.ndarray):
                    np.testing.assert_array_equal(v, exp)
                elif t == "float":
                    assert np.float32(v) == np.float32(exp)
                elif t == "double":
                    assert float(v) == float(exp)
                else:
                    assert v == exp, (t, name, v, exp)


@pytest.mark.parametrize("rec_press", ["none", "zlib", "zstd"])
@pytest.mark.parametrize("sig_press", ["none", "svb-zd"])
def test_aux_roundtrip_fuzz(tmp_path, rec_press, sig_press):
    import zlib

    # zlib.crc32, NOT hash(): str hash is salted per process, which
    # would make failures irreproducible across runs
    rng = np.random.default_rng(zlib.crc32(f"{rec_press}/{sig_press}".encode()))
    for trial in range(6):
        meta = _random_schema(rng)
        p = str(tmp_path / f"t{trial}.blow5")
        recs = []
        with Slow5Writer(
            p, header_data=[{}], aux_meta=meta,
            rec_press=rec_press, sig_press=sig_press,
        ) as w:
            for i in range(int(rng.integers(1, 5))):
                aux = {name: _random_value(rng, t) for name, t in meta}
                r = Slow5Record(
                    read_id=f"r{i}", read_group=0, digitisation=8192.0,
                    offset=float(rng.integers(0, 20)), range=1400.0,
                    sampling_rate=4000.0,
                    raw_signal=rng.integers(
                        -2000, 2000, int(rng.integers(0, 64))
                    ).astype(np.int16),
                    aux=aux,
                )
                recs.append((r, aux))
                w.write_record(r)
        with Slow5File(p) as sf:
            got = [
                sf.decode_record(b, with_aux=True)
                for b in iter(sf.read_next_blob, None)
            ]
        assert len(got) == len(recs)
        for (want, aux), rec in zip(recs, got):
            assert rec.read_id == want.read_id
            np.testing.assert_array_equal(rec.raw_signal, want.raw_signal)
            for name, t in meta:
                exp = _expect(t, aux[name])
                v = rec.aux[name]
                if exp is None:
                    assert v is None, (t, name, v)
                elif isinstance(exp, np.ndarray):
                    np.testing.assert_array_equal(v, exp)
                elif isinstance(exp, float):
                    assert v == pytest.approx(exp, rel=0, abs=0), (t, v, exp)
                else:
                    assert v == exp, (t, name, v, exp)

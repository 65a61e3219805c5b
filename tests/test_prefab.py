"""CBOR prefab container: decoder, tensor extraction, and the full
load_rwkv7 path on a synthesized prefab fixture (VERDICT r2 task 5c;
parity: shared_runtime.rs:85-138 sniffs safetensors-else-prefab)."""

import struct

import numpy as np
import pytest

from rwkv_tts_tpu.models.convert import load_rwkv7, read_lm_checkpoint
from rwkv_tts_tpu.models.prefab import CborError, decode_cbor, read_prefab

from test_convert import make_rwkv7_checkpoint


# --------------------------------------------------------------------------
# minimal CBOR writer (test-side only)
# --------------------------------------------------------------------------

def _head(major, n):
    if n < 24:
        return bytes([(major << 5) | n])
    if n < 256:
        return bytes([(major << 5) | 24, n])
    if n < 65536:
        return bytes([(major << 5) | 25]) + struct.pack(">H", n)
    if n < 2 ** 32:
        return bytes([(major << 5) | 26]) + struct.pack(">I", n)
    return bytes([(major << 5) | 27]) + struct.pack(">Q", n)


def enc(obj):
    if isinstance(obj, bool):
        return bytes([0xF5 if obj else 0xF4])
    if obj is None:
        return bytes([0xF6])
    if isinstance(obj, int):
        return _head(0, obj) if obj >= 0 else _head(1, -1 - obj)
    if isinstance(obj, float):
        return bytes([0xFB]) + struct.pack(">d", obj)
    if isinstance(obj, bytes):
        return _head(2, len(obj)) + obj
    if isinstance(obj, str):
        b = obj.encode()
        return _head(3, len(b)) + b
    if isinstance(obj, list):
        return _head(4, len(obj)) + b"".join(enc(x) for x in obj)
    if isinstance(obj, dict):
        return _head(5, len(obj)) + b"".join(
            enc(k) + enc(v) for k, v in obj.items())
    raise TypeError(type(obj))


def _tensor_node(arr, dtype=np.float16, wrap_fp16=True):
    node = {"shape": list(arr.shape),
            "data": np.ascontiguousarray(arr, dtype).tobytes()}
    return {"Fp16": node} if wrap_fp16 else node


# --------------------------------------------------------------------------
# decoder unit tests
# --------------------------------------------------------------------------

def test_cbor_scalars_strings_nesting():
    doc = {"a": 1, "b": -5, "c": [1.5, True, None, "txt"],
           "d": b"\x00\x01", "big": 2 ** 40, "neg": -(2 ** 33)}
    assert decode_cbor(enc(doc)) == doc


def test_cbor_indefinite_and_f16():
    # indefinite-length array: 0x9F items... 0xFF
    buf = b"\x9f" + enc(1) + enc(2) + b"\xff"
    assert decode_cbor(buf) == [1, 2]
    # f16 1.0 = 0x3C00
    assert decode_cbor(b"\xf9\x3c\x00") == 1.0
    # tag 42 wrapping an int unwraps
    assert decode_cbor(bytes([0xD8, 42]) + enc(7)) == 7


def test_cbor_truncated_raises():
    with pytest.raises(CborError):
        decode_cbor(b"\x82" + enc(1))  # array(2) with one element


# --------------------------------------------------------------------------
# prefab → load_rwkv7
# --------------------------------------------------------------------------

def _write_prefab(path, tensors, wrap_fp16=True, dtype=np.float16,
                  quant_int8=False):
    """Serialize a BlinkDL-style dict as a web-rwkv-shaped prefab doc:
    struct fields embed/head/blocks[i].att|ffn with web-rwkv matrix
    spellings (w_r/w_k/w_v/w_o). ``quant_int8`` wraps the big att/ffn
    matrices as Int8 variants instead of Fp16 (``"blinkdl"`` for the
    ChatRWKV row/col-vector scheme, ``"fused"`` for the web-rwkv 0.10.x
    per-block minmax scheme; True means blinkdl)."""
    L = 1 + max(int(k.split(".")[1]) for k in tensors if k.startswith("blocks."))
    rename = {"receptance.weight": "w_r", "key.weight": "w_k",
              "value.weight": "w_v", "output.weight": "w_o"}
    blocks = []
    for i in range(L):
        att, ffn, blk = {}, {}, {}
        for k, v in tensors.items():
            if not k.startswith(f"blocks.{i}."):
                continue
            sub = k.split(".", 2)[2]
            if sub.startswith("att."):
                name = sub[4:]
                name = rename.get(name, name)
                wrap = wrap_fp16 and name in ("w_r", "w_k", "w_v", "w_o")
                if quant_int8 and name in ("w_r", "w_k", "w_v", "w_o"):
                    mk = (_int8_fused_node if quant_int8 == "fused"
                          else _int8_node)
                    att[name] = mk(np.asarray(v, np.float32))
                else:
                    att[name] = _tensor_node(v, dtype, wrap)
            elif sub.startswith("ffn."):
                name = {"key.weight": "w_k", "value.weight": "w_v"}.get(
                    sub[4:], sub[4:])
                wrap = wrap_fp16 and name in ("w_k", "w_v")
                if quant_int8 and name in ("w_k", "w_v"):
                    mk = (_int8_fused_node if quant_int8 == "fused"
                          else _int8_node)
                    ffn[name] = mk(np.asarray(v, np.float32))
                else:
                    ffn[name] = _tensor_node(v, dtype, wrap)
            else:
                blk[sub] = _tensor_node(v, dtype, False)
        blocks.append({"att": att, "ffn": ffn, **blk})
    doc = {
        "info": {"version": "V7", "num_layer": L},
        "tensor": {
            "embed": _tensor_node(tensors["emb.weight"], dtype, False),
            "head": _tensor_node(tensors["head.weight"], dtype, wrap_fp16),
            "ln_out.weight": _tensor_node(tensors["ln_out.weight"], dtype, False),
            "ln_out.bias": _tensor_node(tensors["ln_out.bias"], dtype, False),
            "blocks": blocks,
        },
    }
    with open(path, "wb") as f:
        f.write(enc(doc))


def test_prefab_read_and_full_load(tmp_path):
    t = make_rwkv7_checkpoint()
    p = str(tmp_path / "model.prefab")
    _write_prefab(p, t, dtype=np.float32)

    flat = read_prefab(p)
    assert "emb.weight" in flat and "head.weight" in flat
    assert "blocks.0.att.receptance.weight" in flat
    assert "blocks.1.ffn.key.weight" in flat
    np.testing.assert_allclose(flat["emb.weight"], t["emb.weight"],
                               atol=1e-6)

    # the sniffing loader takes the same file end-to-end
    params, cfg = load_rwkv7(p, dtype="float32")
    assert cfg.n_layer == 2 and cfg.n_embd == 128
    assert cfg.vocab_size == 1000
    assert params["blocks"]["w_r"].shape == (2, 128, 128)


def test_prefab_f16_payload(tmp_path):
    t = make_rwkv7_checkpoint()
    p = str(tmp_path / "model16.prefab")
    _write_prefab(p, t, dtype=np.float16)
    flat = read_prefab(p)
    np.testing.assert_allclose(
        flat["blocks.0.att.w1"], t["blocks.0.att.w1"].astype(np.float16),
        atol=1e-6)


def test_prefab_nf4_refused(tmp_path):
    doc = {"tensor": {"head": {"NF4": {
        "w": {"shape": [4, 4], "data": b"\x00" * 8},
        "q": {"shape": [16], "data": b"\x00" * 32},
        "m": {"shape": [4], "data": b"\x00" * 16},
    }}}}
    p = str(tmp_path / "q.prefab")
    with open(p, "wb") as f:
        f.write(enc(doc))
    with pytest.raises(CborError, match="quantized|NF4"):
        read_prefab(p)


def _f32_node(a):
    return {"shape": list(a.shape),
            "data": np.ascontiguousarray(a, np.float32).tobytes()}


def _int8_node(arr):
    """Wrap a float matrix as a web-rwkv Int8 variant (BlinkDL scheme)."""
    from rwkv_tts_tpu.models.prefab import quantize_int8_blinkdl
    q, mx, rx, my, ry = quantize_int8_blinkdl(arr)
    return {"Int8": {
        "w": {"shape": list(q.shape), "data": q.tobytes()},
        "mx": _f32_node(mx), "rx": _f32_node(rx),
        "my": _f32_node(my), "ry": _f32_node(ry),
    }}


def _int8_fused_node(arr, block=64):
    """Wrap a float matrix as a web-rwkv 0.10.x Int8 variant (fused
    per-block minmax scheme: u8 w + interleaved (min, max) f32 pairs)."""
    from rwkv_tts_tpu.models.prefab import quantize_int8_blockminmax
    q, m = quantize_int8_blockminmax(arr, block=block)
    return {"Int8": {
        "w": {"shape": list(q.shape), "data": q.tobytes()},
        "m": _f32_node(m),
    }}


def test_prefab_int8_fused_variant_loads_end_to_end(tmp_path):
    """The web-rwkv 0.10.x fused {w, m} Int8 layout (r4 advisor medium:
    the version the reference pins serializes per-block minmax pairs,
    not the ChatRWKV row/col vectors) decodes: block size inferred from
    the size ratio, dequant min + q/255·(max−min)."""
    import jax.numpy as jnp

    from rwkv_tts_tpu.models import rwkv7
    from rwkv_tts_tpu.models.prefab import (
        _dequant_int8_blockminmax, quantize_int8_blockminmax)

    # roundtrip accuracy of the scheme itself (worst case: half the
    # per-block range per step of 255)
    rng = np.random.default_rng(1)
    w = rng.standard_normal((96, 64)).astype(np.float32) * 0.3
    q, m = quantize_int8_blockminmax(w, block=128)
    back = _dequant_int8_blockminmax(q, m, 128)
    pairs = m.reshape(-1, 2)
    step = float((pairs[:, 1] - pairs[:, 0]).max()) / 255.0
    assert np.abs(back - w).max() <= step / 2 + 1e-6
    assert np.corrcoef(back.ravel(), w.ravel())[0, 1] > 0.999

    # full-container path with inferred block size
    t = make_rwkv7_checkpoint()
    p = str(tmp_path / "int8_fused.prefab")
    _write_prefab(p, t, dtype=np.float32, quant_int8="fused")
    flat = read_prefab(p)
    ref = t["blocks.0.att.receptance.weight"].astype(np.float32)
    got = flat["blocks.0.att.receptance.weight"]
    assert got.shape == ref.shape
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999

    params, cfg = load_rwkv7(p, dtype="float32")
    state = rwkv7.init_state(cfg, 1)
    logits, _ = rwkv7.forward(params, jnp.array([[5, 17, 300]]), state, cfg)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_prefab_int8_fused_bad_minmax_size_fails_loudly(tmp_path):
    """A {w, m} variant whose |m| matches no block candidate must refuse
    (a wrong pairing would silently corrupt every quantized weight)."""
    doc = {"tensor": {"head": {"Int8": {
        "w": {"shape": [4, 4], "data": b"\x00" * 16},
        "m": {"shape": [4], "data": b"\x00" * 16},
    }}}}
    p = str(tmp_path / "badm.prefab")
    with open(p, "wb") as f:
        f.write(enc(doc))
    with pytest.raises(CborError, match="matches no per-block minmax"):
        read_prefab(p)


def test_prefab_int8_variant_loads_end_to_end(tmp_path):
    """A synthesized Int8 quantized prefab (VERDICT r3 missing #3) loads
    through read_prefab → load_rwkv7 and decodes tokens: the Int8 variant
    dequantizes with the BlinkDL affine inverse instead of refusing."""
    import jax.numpy as jnp

    from rwkv_tts_tpu.config import RwkvConfig  # noqa: F401 (load path)
    from rwkv_tts_tpu.models import rwkv7
    from rwkv_tts_tpu.models.prefab import (
        _dequant_int8_blinkdl, quantize_int8_blinkdl)

    # roundtrip accuracy of the scheme itself
    rng = np.random.default_rng(0)
    w = rng.standard_normal((96, 64)).astype(np.float32) * 0.3
    q, mx, rx, my, ry = quantize_int8_blinkdl(w)
    back = _dequant_int8_blinkdl(q, mx, rx, my, ry)
    step = (ry.max() * rx.max()) / 256.0
    assert np.abs(back - w).max() <= step + 1e-6
    assert np.corrcoef(back.ravel(), w.ravel())[0, 1] > 0.999

    # full-container path: quantize the big att/ffn matrices, keep the
    # rest f32 (mirrors a partially-quantized web-rwkv export)
    t = make_rwkv7_checkpoint()
    p = str(tmp_path / "int8.prefab")
    _write_prefab(p, t, dtype=np.float32, quant_int8=True)
    flat = read_prefab(p)
    ref = t["blocks.0.att.receptance.weight"].astype(np.float32)
    got = flat["blocks.0.att.receptance.weight"]
    assert got.shape == ref.shape
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999

    params, cfg = load_rwkv7(p, dtype="float32")
    assert cfg.n_layer == 2
    state = rwkv7.init_state(cfg, 1)
    logits, state = rwkv7.forward(
        params, jnp.array([[5, 17, 300]]), state, cfg)
    assert bool(jnp.all(jnp.isfinite(logits)))
    logits2, _ = rwkv7.step(params, jnp.array([7]), state, cfg)
    assert bool(jnp.all(jnp.isfinite(logits2)))


def test_prefab_int8_drifted_structure_fails_loudly(tmp_path):
    doc = {"tensor": {"head": {"Int8": {
        "w": {"shape": [4, 4], "data": b"\x00" * 16},
        "scales": {"shape": [4], "data": b"\x00" * 16},
    }}}}
    p = str(tmp_path / "drift.prefab")
    with open(p, "wb") as f:
        f.write(enc(doc))
    with pytest.raises(CborError, match="expected w \\+ mx/rx/my/ry"):
        read_prefab(p)


def test_prefab_bare_u8_blob_refused(tmp_path):
    """A width-1 byte payload OUTSIDE a recognized quant variant must not
    silently load 0–255 integers as weights (ADVICE r3)."""
    doc = {"tensor": {"head": {"shape": [4, 4], "data": b"\x7f" * 16}}}
    p = str(tmp_path / "u8.prefab")
    with open(p, "wb") as f:
        f.write(enc(doc))
    with pytest.raises(CborError, match="raw byte payload"):
        read_prefab(p)


def test_prefab_unmappable_names_fail_loudly(tmp_path):
    doc = {"stuff": {"alpha": {"shape": [2, 2],
                               "data": b"\x00" * 16}}}
    p = str(tmp_path / "odd.prefab")
    with open(p, "wb") as f:
        f.write(enc(doc))
    with pytest.raises(CborError, match="none map onto"):
        read_prefab(p)


def test_sniffing_order(tmp_path):
    # a safetensors file still loads through read_lm_checkpoint
    from test_convert import write_safetensors
    t = make_rwkv7_checkpoint()
    p = str(tmp_path / "m.safetensors")
    write_safetensors(p, t)
    got = read_lm_checkpoint(p)
    assert "blocks.0.att.w1" in got
    # garbage is neither
    bad = str(tmp_path / "bad.bin")
    with open(bad, "wb") as f:
        f.write(b"\x00\x01\x02garbage")
    with pytest.raises(ValueError, match="neither"):
        read_lm_checkpoint(bad)


def test_cbor_fuzz_no_uncontrolled_exceptions():
    """Arbitrary bytes must produce CborError (or a clean decode), never
    an uncontrolled IndexError/struct.error/RecursionError — this parser
    fronts user-supplied checkpoint files."""
    import random

    rng = random.Random(0)
    for trial in range(300):
        n = rng.randrange(0, 64)
        buf = bytes(rng.randrange(256) for _ in range(n))
        try:
            decode_cbor(buf)
        except CborError:
            pass
        except RecursionError:
            raise AssertionError(f"recursion blowup on {buf.hex()}")
    # truncated versions of a valid document
    valid = enc({"a": [1, 2.5, "x"], "b": b"\x00" * 8})
    for cut in range(len(valid)):
        try:
            decode_cbor(valid[:cut])
        except CborError:
            pass


def test_cbor_rejects_indefinite_int_heads():
    # RFC 8949: additional-info 31 is invalid for major 0/1/6
    for b in (b"\x1f", b"\x3f", bytes([0xDF]) + enc(1)):
        with pytest.raises(CborError):
            decode_cbor(b)


def test_short_file_is_clean_error(tmp_path):
    p = str(tmp_path / "tiny.bin")
    with open(p, "wb") as f:
        f.write(b"\x01\x02")
    with pytest.raises(ValueError, match="neither"):
        read_lm_checkpoint(p)

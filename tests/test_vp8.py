"""Lossy VP8 keyframe codec (r14, RFC 6386 — SURVEY.md §2.10 media).

Three layers of certification:
1. CONFORMANCE against the system libwebp (the format's reference
   implementation), both directions: libwebp-encoded streams decoded
   by us, our encoder's streams decoded by libwebp — YUV planes
   compared bit-for-bit. Real encoder output exercises segmentation,
   per-segment quantizers, all intra modes, skip logic and the §15
   loop filter at real levels. Skipped (not failed) when the shared
   library is absent — every other layer stands alone.
2. Self-contained round-trips of the uniform-per-MB encoder twin
   (the registry query q_media_vp8_stats adds the DuckDB oracle).
3. The normative tables committed in operators/vp8_tables.py are
   re-verified byte-for-byte against the library when present.
"""
from __future__ import annotations

import ctypes

import numpy as np
import pytest

import incremental_github_data_pipeline_spark.operators.multimodal as mm


def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


LIBWEBP = _libwebp()
needs_libwebp = pytest.mark.skipif(
    LIBWEBP is None, reason="system libwebp not present"
)


def _webp_encode_rgb(rgb: np.ndarray, q: float) -> bytes:
    h, w = rgb.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LIBWEBP.WebPEncodeRGB(
        rgb.tobytes(), w, h, w * 3, q, ctypes.byref(out)
    )
    assert n > 0
    data = ctypes.string_at(out, n)
    LIBWEBP.WebPFree(out)
    return data


def _webp_decode_yuv(data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uvstride = ctypes.c_int()
    yp = LIBWEBP.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uvstride),
    )
    assert yp, "libwebp refused the stream"
    W, H, S, US = w.value, h.value, stride.value, uvstride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y = np.frombuffer(
        ctypes.string_at(yp, S * H), dtype=np.uint8
    ).reshape(H, S)[:, :W].copy()
    u = np.frombuffer(
        ctypes.string_at(up, US * ch), dtype=np.uint8
    ).reshape(ch, US)[:, :cw].copy()
    v = np.frombuffer(
        ctypes.string_at(vp, US * ch), dtype=np.uint8
    ).reshape(ch, US)[:, :cw].copy()
    LIBWEBP.WebPFree(yp)
    return y, u, v


def _test_image(w: int, h: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    x = np.arange(w)[None, :]
    yy = np.arange(h)[:, None]
    base = (x * 3 + yy * 5) % 256
    rgb = np.stack(
        [base, (base * 2 + 40) % 256, (255 - base) % 256], axis=2
    ).astype(np.uint8)
    r0, r1 = h // 3, max(h // 3 + 1, 2 * h // 3)
    c0, c1 = w // 3, max(w // 3 + 1, 2 * w // 3)
    rgb[r0:r1, c0:c1] = rng.randint(
        0, 255, (r1 - r0, c1 - c0, 3)
    ).astype(np.uint8)
    return rgb


class TestVp8LibwebpConformance:
    @needs_libwebp
    @pytest.mark.parametrize("dims", [(16, 16), (48, 48), (33, 21),
                                      (17, 9), (128, 96)])
    @pytest.mark.parametrize("q", [10.0, 50.0, 80.0, 95.0])
    def test_decodes_libwebp_streams_bit_exactly(self, dims, q):
        """Real libwebp encoder output (segmentation, loop filter,
        mixed intra modes) must decode to the reference's own YUV
        planes bit-for-bit."""
        w, h = dims
        data = _webp_encode_rgb(_test_image(w, h, w * h), q)
        ry, ru, rv = _webp_decode_yuv(data)
        my, mu, mv = mm.decode_vp8_keyframe(data)
        assert np.array_equal(my, ry)
        assert np.array_equal(mu, ru)
        assert np.array_equal(mv, rv)

    @needs_libwebp
    @pytest.mark.parametrize("dims,seed", [((16, 16), 0), ((33, 21), 1),
                                           ((64, 48), 2), ((17, 9), 4)])
    def test_libwebp_decodes_our_streams(self, dims, seed):
        """Our encoder twin's bitstreams are valid VP8: libwebp
        decodes them to exactly our decoder's planes (which equal
        the closed-form targets)."""
        w, h = dims

        def yt(mx, my):
            return (seed * 5 + mx * 11 + my * 23) % 256

        def ut(mx, my):
            return (seed * 3 + mx * 13 + my * 7 + 100) % 256

        def vt(mx, my):
            return (seed * 11 + mx * 5 + my * 17 + 50) % 256

        data = mm.encode_webp_lossy_uniform(
            w, h, yt, ut, vt, lambda mx, my: (seed + mx + my) % 5
        )
        ry, ru, rv = _webp_decode_yuv(data)
        my, mu, mv = mm.decode_vp8_keyframe(data)
        assert np.array_equal(my, ry)
        assert np.array_equal(mu, ru)
        assert np.array_equal(mv, rv)

    @needs_libwebp
    def test_committed_tables_match_reference_library(self):
        """operators/vp8_tables.py is generated from the library's
        data section (scripts/extract_vp8_tables.py); re-verify the
        committed values byte-for-byte."""
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "extract_vp8_tables",
            Path(__file__).resolve().parents[1]
            / "scripts" / "extract_vp8_tables.py",
        )
        ext = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ext)
        candidates = [
            p
            for base in ("/usr/lib/x86_64-linux-gnu", "/usr/lib",
                         "/usr/local/lib")
            for p in Path(base).glob("libwebp.so*")
            if p.is_file() and not p.is_symlink()
        ] or [
            p
            for base in ("/usr/lib/x86_64-linux-gnu", "/usr/lib")
            for p in Path(base).glob("libwebp.so*")
            if p.exists()
        ]
        if not candidates:
            pytest.skip("libwebp file not found on disk")
        t = ext.extract(candidates[0].read_bytes())
        from incremental_github_data_pipeline_spark.operators import (
            vp8_tables as vt,
        )

        assert t["coeff"] == vt._COEFF_FLAT
        assert t["update"] == vt._UPDATE_FLAT
        assert t["bmode"] == vt._BMODE_FLAT
        assert t["dc"] == vt.DC_QLOOKUP
        assert t["ac"] == vt.AC_QLOOKUP


class TestVp8EncoderTwin:
    def test_uniform_targets_round_trip_exactly(self):
        for w, h, seed in [(16, 16, 0), (33, 21, 1), (64, 48, 2),
                           (17, 9, 4)]:
            def yt(mx, my):
                return (seed * 5 + mx * 11 + my * 23) % 256

            def ut(mx, my):
                return (seed * 3 + mx * 13 + my * 7 + 100) % 256

            def vt(mx, my):
                return (seed * 11 + mx * 5 + my * 17 + 50) % 256

            data = mm.encode_webp_lossy_uniform(
                w, h, yt, ut, vt, lambda mx, my: (seed + mx + my) % 5
            )
            y, u, v = mm.decode_vp8_keyframe(data)
            assert y.shape == (h, w)
            for yy in range(h):
                for xx in range(w):
                    assert y[yy, xx] == yt(xx // 16, yy // 16)
            cw, ch = (w + 1) // 2, (h + 1) // 2
            for yy in range(ch):
                for xx in range(cw):
                    assert u[yy, xx] == ut(xx // 8, yy // 8)
                    assert v[yy, xx] == vt(xx // 8, yy // 8)

    def test_loop_filter_is_identity_on_uniform_frames(self):
        """§15: every filter adjustment is a function of neighbor
        DIFFERENCES — a uniform frame must come back bit-identical
        at any level, while the filter code path runs for real."""
        for level in (10, 40, 63):
            data = mm.encode_webp_lossy_uniform(
                48, 32,
                lambda mx, my: 77, lambda mx, my: 120,
                lambda mx, my: 200, lambda mx, my: 0,
                filter_level=level,
            )
            y, u, v = mm.decode_vp8_keyframe(data)
            assert (y == 77).all() and (u == 120).all() and (v == 200).all()

    def test_bool_coder_round_trip(self):
        import random

        rng = random.Random(99)
        bits = [(rng.randint(0, 1), rng.randint(1, 254))
                for _ in range(5000)]
        bw = mm._Vp8BoolWriter()
        for bit, prob in bits:
            bw.put(bit, prob)
        br = mm._Vp8BoolReader(bw.finish())
        for bit, prob in bits:
            assert br.get(prob) == bit

    def test_idct_dc_only_and_wht_dc_only(self):
        assert mm._vp8_idct4x4([8] + [0] * 15) == [[1] * 4] * 4
        assert mm._vp8_iwht4x4([64] + [0] * 15) == [8] * 16


class TestAlphChunk:
    """WebP ALPH alpha plane (r14): raw + headerless-VP8L methods,
    all four prediction filters, the real transparent-lossy layout."""

    def _alpha(self, w, h, seed=0):
        xg = np.arange(w)[None, :]
        yg = np.arange(h)[:, None]
        return ((seed * 7 + xg * 3 + yg * 5 + 13) % 256).astype(np.uint8)

    @pytest.mark.parametrize("method", [0, 1])
    @pytest.mark.parametrize("filt", [0, 1, 2, 3])
    def test_round_trip_all_methods_and_filters(self, method, filt):
        for w, h in [(33, 21), (17, 9), (16, 16)]:
            a = self._alpha(w, h, seed=method * 4 + filt)
            body = mm.encode_alph(a, method, filt)
            assert np.array_equal(mm.decode_alph(body, w, h), a)

    def test_container_round_trip_rgba(self):
        w, h = 48, 32
        a = self._alpha(w, h, seed=3)
        data = mm.encode_webp_lossy_uniform_alpha(
            w, h, lambda mx, my: (mx * 11 + my * 23 + 40) % 256,
            lambda mx, my: 100, lambda mx, my: 120,
            lambda mx, my: (mx + my) % 5, a,
            alpha_method=1, alpha_filter=3,
        )
        px = mm.decode_webp_lossless(data)
        assert px.shape == (h, w, 4)
        assert np.array_equal(px[:, :, 3], a)

    def test_frames_timeline_applies_still_alpha(self):
        """ADVICE r14 (fixed r15): the frame-timeline decoder must
        apply a preceding ALPH chunk to a STILL lossy frame — the
        VP8X+ALPH+VP8 transparent-still layout — exactly like
        decode_webp_lossless, not hardcode alpha=255."""
        w, h = 48, 32
        a = self._alpha(w, h, seed=7)
        assert not np.all(a == 255)
        data = mm.encode_webp_lossy_uniform_alpha(
            w, h, lambda mx, my: (mx * 11 + my * 23 + 40) % 256,
            lambda mx, my: 100, lambda mx, my: 120,
            lambda mx, my: (mx + my) % 5, a,
            alpha_method=1, alpha_filter=3,
        )
        frames = mm.decode_webp_frames(data)
        assert len(frames) == 1 and frames[0][0] == 0
        px = frames[0][1]
        assert px.shape == (h, w, 4)
        assert np.array_equal(px[:, :, 3], a)
        assert np.array_equal(px, mm.decode_webp_lossless(data))

    @needs_libwebp
    @pytest.mark.parametrize("method,filt", [(0, 0), (0, 2), (1, 0),
                                             (1, 1), (1, 3)])
    def test_libwebp_reads_our_alpha(self, method, filt):
        w, h = 33, 21
        a = self._alpha(w, h, seed=method + filt)
        data = mm.encode_webp_lossy_uniform_alpha(
            w, h, lambda mx, my: (mx * 11 + my * 23 + 40) % 256,
            lambda mx, my: 100, lambda mx, my: 120,
            lambda mx, my: (mx + my) % 5, a,
            alpha_method=method, alpha_filter=filt,
        )
        LIBWEBP.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        LIBWEBP.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        wi = ctypes.c_int()
        hi = ctypes.c_int()
        p = LIBWEBP.WebPDecodeRGBA(
            data, len(data), ctypes.byref(wi), ctypes.byref(hi)
        )
        assert p, "libwebp refused our ALPH container"
        ref = np.frombuffer(
            ctypes.string_at(p, wi.value * hi.value * 4), dtype=np.uint8
        ).reshape(hi.value, wi.value, 4)[:, :, 3].copy()
        LIBWEBP.WebPFree(p)
        assert np.array_equal(ref, a)

    @needs_libwebp
    def test_stock_python_webp_decodes_end_to_end(self):
        """CPython ships a real third-party VP8X+ALPH+VP8 webp as
        test data; our decode must produce libwebp's alpha plane
        bit-for-bit (RGB legitimately differs: fancy vs
        nearest-neighbor chroma upsampling, outside RFC 6386)."""
        import glob

        paths = glob.glob(
            "/root/.pyenv/versions/*/lib/python*/test/*/python.webp"
        ) + glob.glob(
            "/root/.pyenv/versions/*/lib/python*/test/*/*/python.webp"
        )
        if not paths:
            pytest.skip("no stock python.webp on this system")
        data = open(paths[0], "rb").read()
        mine = mm.decode_webp_lossless(data)
        LIBWEBP.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        LIBWEBP.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        wi = ctypes.c_int()
        hi = ctypes.c_int()
        p = LIBWEBP.WebPDecodeRGBA(
            data, len(data), ctypes.byref(wi), ctypes.byref(hi)
        )
        assert p
        ref = np.frombuffer(
            ctypes.string_at(p, wi.value * hi.value * 4), dtype=np.uint8
        ).reshape(hi.value, wi.value, 4).copy()
        LIBWEBP.WebPFree(p)
        assert mine.shape == ref.shape
        assert np.array_equal(mine[:, :, 3], ref[:, :, 3])

    def test_alph_guards(self):
        a = self._alpha(8, 8)
        with pytest.raises(ValueError, match="method"):
            mm.encode_alph(a, method=2)
        with pytest.raises(ValueError, match="truncated raw"):
            mm.decode_alph(bytes([0]) + b"\x00" * 10, 8, 8)
        with pytest.raises(ValueError, match="reserved ALPH compression"):
            mm.decode_alph(bytes([2]) + b"\x00" * 64, 8, 8)
        with pytest.raises(ValueError, match="reserved ALPH header"):
            mm.decode_alph(bytes([0x40]) + b"\x00" * 64, 8, 8)
        with pytest.raises(ValueError, match="empty"):
            mm.decode_alph(b"", 8, 8)


class TestVp8Animation:
    """r14: ANMF frames carrying lossy VP8 (+ optional ALPH) decode
    through the shared keyframe decoder and compositor."""

    def _frames(self, w, h, alpha=None):
        fr = []
        for fi in range(3):
            fr.append(dict(
                w=w, h=h, x=0, y=0, duration_ms=40 + fi,
                blend=False, alpha=alpha,
                yt=lambda mx, my, fi=fi: (fi * 31 + mx * 11 + my * 23)
                % 256,
                ut=lambda mx, my, fi=fi: (fi * 17 + mx * 13 + 100) % 256,
                vt=lambda mx, my, fi=fi: (fi * 7 + my * 17 + 50) % 256,
                mode=lambda mx, my, fi=fi: (fi + mx + my) % 5,
            ))
        return fr

    def test_full_canvas_chain_round_trips(self):
        w, h = 49, 37
        data = mm.encode_webp_animation_lossy(
            self._frames(w, h), (w, h)
        )
        frames = mm.decode_webp_frames(data)
        assert len(frames) == 3
        assert [d for d, _ in frames] == [40, 41, 42]
        for fi, (_, canvas) in enumerate(frames):
            want = mm.vp8_yuv_to_rgb(
                np.full((16, 16), (fi * 31) % 256, np.uint8),
                np.full((8, 8), (fi * 17 + 100) % 256, np.uint8),
                np.full((8, 8), (fi * 7 + 50) % 256, np.uint8),
            )[0, 0]
            assert np.array_equal(canvas[0, 0, :3], want), fi
            assert (canvas[:, :, 3] == 255).all()

    def test_alph_inside_anmf(self):
        w, h = 33, 21
        a = ((np.arange(h)[:, None] * 5 + np.arange(w)[None, :] * 3)
             % 256).astype(np.uint8)
        data = mm.encode_webp_animation_lossy(
            self._frames(w, h, alpha=a)[:1], (w, h)
        )
        [(_, canvas)] = mm.decode_webp_frames(data)
        assert np.array_equal(canvas[:, :, 3], a)

    def test_sub_rect_overwrite_keeps_border(self):
        w, h = 50, 38
        fr = self._frames(w, h)
        fr[1].update(w=w - 16, h=h - 8, x=8, y=4)
        fr[2].update(w=w - 16, h=h - 8, x=8, y=4)
        data = mm.encode_webp_animation_lossy(fr, (w, h))
        frames = mm.decode_webp_frames(data)
        # the border outside the rect still shows frame 0's pixels
        assert np.array_equal(
            frames[2][1][0, 0], frames[0][1][0, 0]
        )
        assert not np.array_equal(
            frames[2][1][10, 10], frames[0][1][10, 10]
        )


class TestVp8lLibwebpConformance:
    """r14: the VP8L encoder/decoder cross-checked against libwebp —
    the lane that exposed the latent kCodeLengthCodeOrder bug (16
    belongs after 5; self-round-trips shared the wrong order and
    could never catch it)."""

    @needs_libwebp
    def test_libwebp_decodes_every_encoder_variant(self):
        LIBWEBP.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        LIBWEBP.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        px = mm._image_pixels(5)
        cases = [
            dict(), dict(subtract_green=True), dict(predictor_mode=2),
            dict(cache_bits=4), dict(lz77=False), dict(meta_bits=2),
        ]
        for kw in cases:
            data = mm.encode_webp_lossless(px, **kw)
            wi = ctypes.c_int()
            hi = ctypes.c_int()
            p = LIBWEBP.WebPDecodeRGBA(
                data, len(data), ctypes.byref(wi), ctypes.byref(hi)
            )
            assert p, f"libwebp refused {kw}"
            ref = np.frombuffer(
                ctypes.string_at(p, wi.value * hi.value * 4),
                dtype=np.uint8,
            ).reshape(hi.value, wi.value, 4)[:, :, :3].copy()
            LIBWEBP.WebPFree(p)
            assert np.array_equal(ref, px), kw

    @needs_libwebp
    def test_we_decode_libwebp_lossless_streams(self):
        LIBWEBP.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
        LIBWEBP.WebPEncodeLosslessRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        rng = np.random.RandomState(11)
        for w, h in [(40, 30), (64, 48), (33, 21)]:
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            out = ctypes.POINTER(ctypes.c_uint8)()
            n = LIBWEBP.WebPEncodeLosslessRGB(
                px.tobytes(), w, h, w * 3, ctypes.byref(out)
            )
            assert n
            data = ctypes.string_at(out, n)
            LIBWEBP.WebPFree(out)
            mine = mm.decode_webp_lossless(data)
            assert np.array_equal(mine[:, :, :3], px)

    def test_code_length_order_regression(self):
        """A 33-distinct-value channel forces a code-length code with
        a length-6 symbol — the first construct where the pre-r14
        (wrong) order diverged. Pin the round-trip."""
        vals = np.arange(33, dtype=np.uint8)
        px = np.zeros((1, 33, 3), dtype=np.uint8)
        px[0, :, 1] = vals
        px[0, :, 0] = 9
        px[0, :, 2] = 9
        out = mm.decode_webp_lossless(
            mm.encode_webp_lossless(px, lz77=False)
        )
        assert np.array_equal(out, px)


class TestVp8Guards:
    def test_inter_frame_raises(self):
        data = mm.encode_webp_lossy_uniform(
            16, 16, lambda mx, my: 10, lambda mx, my: 20,
            lambda mx, my: 30, lambda mx, my: 0,
        )
        pos = data.index(b"VP8 ") + 8
        bad = bytearray(data)
        bad[pos] |= 1  # set the inter-frame bit in the frame tag
        with pytest.raises(NotImplementedError, match="inter frame"):
            mm.decode_vp8_keyframe(bytes(bad))

    def test_bad_start_code_and_truncation_raise(self):
        data = mm.encode_webp_lossy_uniform(
            16, 16, lambda mx, my: 10, lambda mx, my: 20,
            lambda mx, my: 30, lambda mx, my: 0,
        )
        pos = data.index(b"VP8 ") + 8
        bad = bytearray(data)
        bad[pos + 3] ^= 0xFF
        with pytest.raises(ValueError, match="start code"):
            mm.decode_vp8_keyframe(bytes(bad))
        with pytest.raises(ValueError):
            mm.decode_vp8_keyframe(data[: pos + 8])

    def test_corruption_probe_error_contract(self):
        """Skip-path audit (the r12 container-reader discipline):
        single-byte corruption and truncation of a VP8X+ALPH+VP8
        payload must either decode (lossy arithmetic coding is
        error-tolerant by design; the bool reader zero-pads past the
        end per spec, as libwebp does) or raise ValueError /
        NotImplementedError — never a raw IndexError/KeyError/
        struct.error that would escape an on_error='skip' lane."""
        a = (
            (np.arange(21)[:, None] * 5 + np.arange(33)[None, :] * 3
             + 13) % 256
        ).astype(np.uint8)
        data = mm.encode_webp_lossy_uniform_alpha(
            33, 21, lambda mx, my: (mx * 11 + my * 23 + 40) % 256,
            lambda mx, my: 100, lambda mx, my: 120,
            lambda mx, my: (mx + my) % 5, a,
            alpha_method=1, alpha_filter=3,
        )
        for pos in range(len(data)):
            mut = bytearray(data)
            mut[pos] ^= 0xFF
            try:
                mm.decode_webp_lossless(bytes(mut))
            except (ValueError, NotImplementedError):
                pass
        for cut in range(0, len(data), 7):
            try:
                mm.decode_webp_lossless(data[:cut])
            except (ValueError, NotImplementedError):
                pass

    def test_container_dispatch_returns_rgb(self):
        data = mm.encode_webp_lossy_uniform(
            16, 16, lambda mx, my: 81, lambda mx, my: 90,
            lambda mx, my: 240, lambda mx, my: 0,
        )
        rgb = mm.decode_webp_lossless(data)
        assert rgb.shape == (16, 16, 3)
        # the documented integer BT.601 form, spot-checked
        want = mm.vp8_yuv_to_rgb(
            np.full((16, 16), 81, np.uint8),
            np.full((8, 8), 90, np.uint8),
            np.full((8, 8), 240, np.uint8),
        )
        assert np.array_equal(rgb, want)

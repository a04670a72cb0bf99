"""Round 5: real PNG decode (pure-stdlib codec) behind the media seam.

Covers VERDICT r4 task 2: ``backend='real'`` decodes actual pixels for
PNG (the reference stores real image bytes,
``backend/crawler/image_downloader.py:101-138``); the ``stub`` seam is
demoted to JPEG/ffmpeg only.
"""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from crawlray.pipelines.png import (
    PNG_MAGIC,
    PngFormatError,
    decode_png,
    encode_png,
    is_png,
    resize_box,
    to_gray,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


class TestPngCodec:
    @pytest.mark.parametrize("shape", [(5, 7), (8, 9, 3), (16, 16, 4),
                                       (1, 1, 2), (3, 200, 3)])
    def test_roundtrip(self, shape):
        a = _rng(1).integers(0, 256, shape, dtype=np.uint8)
        d = decode_png(encode_png(a))
        ref = a if a.ndim == 3 else a[:, :, None]
        assert d.shape == ref.shape
        assert (d == ref).all()

    def test_all_filter_types_match_naive_reference(self):
        # hand-built PNGs with filter bytes 0..4 per scanline, checked
        # against a straight-from-spec per-byte unfilter
        rng = _rng(2)

        def ref_unfilter(ftypes, filtrows, w, ch):
            h = len(ftypes)
            stride = w * ch
            out = np.zeros((h, stride), np.int32)
            for y in range(h):
                for x in range(stride):
                    rx = int(filtrows[y][x])
                    a = out[y][x - ch] if x >= ch else 0
                    b = out[y - 1][x] if y > 0 else 0
                    c = out[y - 1][x - ch] if (y > 0 and x >= ch) else 0
                    f = ftypes[y]
                    if f == 0:
                        v = rx
                    elif f == 1:
                        v = rx + a
                    elif f == 2:
                        v = rx + b
                    elif f == 3:
                        v = rx + (a + b) // 2
                    else:
                        p = a + b - c
                        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = (a if (pa_ <= pb and pa_ <= pc)
                                else (b if pb <= pc else c))
                        v = rx + pred
                    out[y][x] = v & 0xFF
            return out.astype(np.uint8)

        def chunk(t, b):
            return (struct.pack(">I", len(b)) + t + b
                    + struct.pack(">I", zlib.crc32(t + b)))

        for ch, ct in [(1, 0), (3, 2), (2, 4), (4, 6)]:
            w, h = 6, 8
            ftypes = [0, 1, 2, 3, 4, 4, 1, 3]
            filtrows = [rng.integers(0, 256, w * ch, dtype=np.uint8)
                        for _ in range(h)]
            ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
            scan = b"".join(bytes([f]) + bytes(r)
                            for f, r in zip(ftypes, filtrows))
            png = (PNG_MAGIC + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(scan))
                   + chunk(b"IEND", b""))
            got = decode_png(png)
            exp = ref_unfilter(ftypes, filtrows, w, ch).reshape(h, w, ch)
            assert (got == exp).all(), (ch, ct)

    def test_palette_expands_to_rgb(self):
        rng = _rng(3)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, (4, 5), dtype=np.uint8)

        def chunk(t, b):
            return (struct.pack(">I", len(b)) + t + b
                    + struct.pack(">I", zlib.crc32(t + b)))

        ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 3, 0, 0, 0)
        scan = b"".join(b"\x00" + bytes(r) for r in idx)
        png = (PNG_MAGIC + chunk(b"IHDR", ihdr)
               + chunk(b"PLTE", pal.tobytes())
               + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
        assert (decode_png(png) == pal[idx]).all()

    def test_loud_errors(self):
        ok = encode_png(np.zeros((2, 2), np.uint8))
        assert is_png(ok) and not is_png(b"nope")
        for bad in [b"nope", ok[:-4], ok[:20]]:
            with pytest.raises(PngFormatError):
                decode_png(bad)
        # corrupt a CRC byte -> loud
        corrupt = bytearray(ok)
        corrupt[-1] ^= 0xFF
        with pytest.raises(PngFormatError):
            decode_png(bytes(corrupt))

    def test_resize_box_exact_on_blocks(self):
        g = np.kron(np.arange(72, dtype=np.float64).reshape(8, 9),
                    np.ones((10, 10)))
        assert np.allclose(resize_box(g, 8, 9), np.arange(72).reshape(8, 9))

    def test_to_gray_weights(self):
        px = np.zeros((1, 1, 3), np.uint8)
        px[0, 0] = (255, 0, 0)
        assert abs(to_gray(px)[0, 0] - 0.299 * 255) < 1e-9


def _family_images(n_families=4, h=48, w=64, seed=7):
    """Per family: a base random image + re-encode + brightness shift +
    2x nearest-upscale (all should dHash within Hamming<=3 of the base);
    families are mutually unrelated (expected Hamming ~32)."""
    rng = _rng(seed)
    out = {}  # ref -> (family, png_bytes)
    for f in range(n_families):
        base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        shifted = np.clip(base.astype(np.int16) + 5, 0, 255).astype(np.uint8)
        upscaled = np.kron(base, np.ones((2, 2, 1), np.uint8))
        out[f"http://img.test/f{f}/base.png"] = (f, encode_png(base))
        out[f"http://img.test/f{f}/reenc.png"] = (f, encode_png(base.copy()))
        out[f"http://img.test/f{f}/bright.png"] = (f, encode_png(shifted))
        out[f"http://img.test/f{f}/up2x.png"] = (f, encode_png(upscaled))
    return out


class TestRealDecodeRayPipeline:
    def test_media_decoder_real_backend(self, ray_session):
        import ray.data as rd

        from crawlray.pipelines.media import MediaDecoder

        imgs = _family_images(n_families=2)
        refs = sorted(imgs)
        tbl = pa.table({
            "media_ref": pa.array(refs + ["http://img.test/not-a-png"],
                                  pa.string()),
            "payload": pa.array([imgs[r][1] for r in refs] + [b"JFIFjunk"],
                                pa.binary()),
        })
        out = (rd.from_arrow(tbl)
               .map_batches(MediaDecoder(backend="real"),
                            batch_format="pyarrow", batch_size=16,
                            concurrency=1)
               .to_pandas().set_index("media_ref"))
        for r in refs:
            w = 128 if "up2x" in r else 64
            h = 96 if "up2x" in r else 48
            assert out.loc[r, "width"] == w and out.loc[r, "height"] == h
            assert out.loc[r, "feature"] != ""
        # identical pixels -> identical real feature; shifted -> different
        for f in range(2):
            pre = f"http://img.test/f{f}/"
            assert (out.loc[pre + "base.png", "feature"]
                    == out.loc[pre + "reenc.png", "feature"])
            assert (out.loc[pre + "base.png", "feature"]
                    != out.loc[pre + "bright.png", "feature"])
        # non-PNG payload -> error row, not a crash
        assert out.loc["http://img.test/not-a-png", "width"] == 0
        assert out.loc["http://img.test/not-a-png", "feature"] == ""

    def test_image_phash_dups_over_real_pixels(self, ray_session):
        """The image near-dup funnel (PHasher -> banded_hamming_pairs)
        over REAL decoded pixels: family variants pair up within
        Hamming<=3, unrelated images never pair."""
        import ray.data as rd

        from crawlray.pipelines.dedup import banded_hamming_pairs
        from crawlray.pipelines.media import PHASH_ID_MOD, PHasher
        from crawlray.util import md5_id_bucket

        imgs = _family_images(n_families=4)
        refs = sorted(imgs)
        tbl = pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "payload": pa.array([imgs[r][1] for r in refs], pa.binary()),
        })
        sigs = (rd.from_arrow(tbl)
                .map_batches(PHasher(backend="real"),
                             batch_format="pyarrow", batch_size=8,
                             concurrency=2))
        pairs = banded_hamming_pairs(sigs, max_hamming=3).to_pandas()
        id2ref = dict(zip(md5_id_bucket("phash-v1", refs, PHASH_ID_MOD),
                          refs))
        fam = {r: f for r, (f, _) in imgs.items()}
        got = {(min(id2ref[a], id2ref[b]), max(id2ref[a], id2ref[b]))
               for a, b in zip(pairs["a"], pairs["b"])}
        # no cross-family pair survives Hamming<=3
        for ra, rb in got:
            assert fam[ra] == fam[rb], (ra, rb)
        # every family's base--reenc pair (identical pixels, Hamming 0)
        # and base--bright pair (uniform shift preserves comparisons)
        # is found
        for f in range(4):
            pre = f"http://img.test/f{f}/"
            for v in ("reenc", "bright"):
                key = tuple(sorted((pre + "base.png", pre + f"{v}.png")))
                assert key in got, key

    def test_stub_is_jpeg_only_seam(self, ray_session):
        from crawlray.pipelines.media import MediaDecoder, PHasher

        t = pa.table({"media_ref": pa.array(["x"], pa.string()),
                      "payload": pa.array([b"\xff\xd8jpeg"], pa.binary())})
        with pytest.raises(NotImplementedError, match="JPEG"):
            MediaDecoder(backend="stub")(t)
        with pytest.raises(NotImplementedError, match="JPEG"):
            PHasher(backend="stub")(t)


class TestGifCodec:
    def test_roundtrip_including_interlaced(self):
        from crawlray.pipelines.gif import decode_gif, encode_gif, is_gif

        rng = _rng(11)
        for (h, w, n) in [(5, 7, 4), (48, 64, 256), (1, 1, 2), (16, 9, 100)]:
            pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
            idx = rng.integers(0, n, (h, w), dtype=np.uint8)
            for inter in (False, True):
                g = encode_gif(idx, pal, interlace=inter)
                assert is_gif(g)
                got = decode_gif(g)
                assert got.shape == (h, w, 3)
                assert (got == pal[idx]).all(), (h, w, n, inter)

    def test_lzw_kwkwk_and_width_bump(self):
        from crawlray.pipelines.gif import _lzw_decode

        def pack(code_widths):
            acc = bits = 0
            out = bytearray()
            for c, cw in code_widths:
                acc |= c << bits
                bits += cw
                while bits >= 8:
                    out.append(acc & 0xFF)
                    acc >>= 8
                    bits -= 8
            if bits:
                out.append(acc & 0xFF)
            return bytes(out)

        # KwKwK: mcs=2 stream CLEAR,1,<next-entry> -> [1,1,1]
        assert _lzw_decode(pack([(4, 3), (1, 3), (6, 3), (5, 3)]),
                           2, 3).tolist() == [1, 1, 1]
        # dict growth to 2^width forces the read-width bump mid-stream
        stream = pack([(4, 3), (0, 3), (1, 3), (6, 3), (7, 4), (5, 4)])
        assert _lzw_decode(stream, 2, 6).tolist() == [0, 1, 0, 1, 1, 0]

    def test_loud_errors(self):
        from crawlray.pipelines.gif import GifFormatError, decode_gif, \
            encode_gif

        ok = encode_gif(np.zeros((2, 2), np.uint8), np.zeros((2, 3), np.uint8))
        for bad in [b"nope", ok[:-3], ok[:10]]:
            with pytest.raises(GifFormatError):
                decode_gif(bad)

    def test_mixed_png_gif_through_real_decoder(self, ray_session):
        """A mixed PNG+GIF batch decodes for real through the Ray stage;
        identical pixels produce identical features across FORMATS."""
        import ray.data as rd

        from crawlray.pipelines.gif import encode_gif
        from crawlray.pipelines.media import MediaDecoder

        rng = _rng(12)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, (20, 30), dtype=np.uint8)
        rgb = pal[idx]                         # same pixels, two formats
        tbl = pa.table({
            "media_ref": pa.array(["a.png", "b.gif", "c.jpg"], pa.string()),
            "payload": pa.array([encode_png(rgb), encode_gif(idx, pal),
                                 b"\xff\xd8notreallyjpeg"], pa.binary()),
        })
        out = (rd.from_arrow(tbl)
               .map_batches(MediaDecoder(backend="real"),
                            batch_format="pyarrow", concurrency=1)
               .to_pandas().set_index("media_ref"))
        assert out.loc["a.png", "width"] == 30
        assert out.loc["b.gif", "width"] == 30
        assert out.loc["a.png", "feature"] == out.loc["b.gif", "feature"]
        assert out.loc["c.jpg", "width"] == 0   # jpeg stays the stub


class TestPayloadIsolation:
    def test_phash_funnel_payloads_never_enter_exchange(self, ray_session):
        """VERDICT r4 task 8 (test-scale twin of the bench leg): over a
        real-PNG corpus, only fixed-width signatures feed the pairing
        exchange — measured via materialized block sizes, not assumed."""
        from crawlray.pipelines.media import phash_payload_isolation

        r = phash_payload_isolation(400, family_size=8, concurrency=2)
        assert r["n_refs"] == 400
        assert "payload" not in r["sig_columns"]
        # ~15 MB of PNG payloads vs a few KB of signatures
        assert r["payload_bytes"] > 5_000_000
        assert r["exchange_fraction"] < 0.01
        # near-dup structure is genuine: identity/brightness variants in
        # every family of 8 must pair (>= a quarter of the max possible
        # pairs survive the Hamming<=3 verify, noise variants may drop)
        assert r["n_pairs"] >= (400 // 8) * 28 // 4


class TestGcDuringLiveCrawl:
    """VERDICT r4 task 6: GC applied BETWEEN rounds of a live crawl —
    and on a crashed mid-round state — never deletes anything the
    resume path needs; the resumed crawl converges byte-identically to
    an uninterrupted run (modulo the orphans GC is SUPPOSED to delete,
    so both trees are compared after a final GC pass on each)."""

    def test_gc_between_rounds_then_crash_resume_byte_identical(
            self, ray_session, tmp_path):
        import dataclasses
        import glob
        import shutil
        from pathlib import Path

        from crawlray.checkpoint import gc_plan
        from crawlray.engine import CrawlEngine, EngineConfig
        from crawlray.synth import WorldConfig

        cfg = EngineConfig(world=WorldConfig(n_urls=900, n_hosts=12),
                           n_seeds=12, max_rounds=3, n_parts=3,
                           n_frontier_parts=2, n_seen_shards=4)

        def tree_bytes(root):
            return {str(p.relative_to(root)): p.read_bytes()
                    for p in sorted(Path(root).rglob("*"))
                    if p.is_file() and p.suffix != ".tmp"}

        # reference: uninterrupted 3-round run
        out_full = str(tmp_path / "full")
        full_summary = CrawlEngine(cfg, out_full).run()

        # interleaved: one round at a time with GC APPLY between rounds
        out2 = str(tmp_path / "interleaved")
        for horizon in (1, 2):
            c = dataclasses.replace(cfg, max_rounds=horizon)
            CrawlEngine(c, out2).run(resume=True)
            plan = gc_plan(out2, apply=True)
            # superseded frontiers become orphans over the run; the
            # manifests themselves never do
            assert not any(o.startswith("manifests/")
                           for o in plan["orphans"])

        # crash mid-round-2: its manifest was never committed, one
        # corpus partial and the next frontier are partial on disk
        c3 = dataclasses.replace(cfg, max_rounds=3)
        CrawlEngine(c3, out2).run(resume=True)
        last = 2
        Path(f"{out2}/manifests/manifest-{last + 1:04d}.json").unlink()
        partials = sorted(
            glob.glob(f"{out2}/corpus/round-{last:04d}/*.parquet"))
        Path(partials[0]).unlink()
        for p in glob.glob(f"{out2}/frontier/round-{last + 1:04d}/*.parquet"):
            Path(p).unlink()

        # GC on the CRASHED state: the uncommitted round's leftovers are
        # orphans by design (resume re-executes the round); everything
        # the latest committed manifest references must survive
        import json
        latest = json.loads(
            Path(f"{out2}/manifests/manifest-{last:04d}.json").read_text())
        needed = (set(latest["lineage"]["corpus_files"])
                  | set(latest["lineage"]["metric_files"])
                  | set(latest["frontier_files"])
                  | set(latest["seen_files"]))
        plan = gc_plan(out2, apply=True)
        assert not (set(plan["orphans"]) & needed)

        # resume to the full horizon -> byte-identical to the
        # uninterrupted run after one final GC pass on each tree
        res = CrawlEngine(cfg, out2).run(resume=True)
        assert res["seen_total"] == full_summary["seen_total"]
        gc_plan(out_full, apply=True)
        gc_plan(out2, apply=True)
        a, b = tree_bytes(out_full), tree_bytes(out2)
        assert set(a) == set(b)
        assert [k for k in a if a[k] != b[k]] == []

        # and the converged state still resumes to a no-op
        res2 = CrawlEngine(cfg, out2).run(resume=True)
        assert res2["rounds"] == 0
        assert res2["seen_total"] == full_summary["seen_total"]

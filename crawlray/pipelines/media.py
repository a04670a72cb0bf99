"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Generalizes the reference's image pipeline
(``backend/crawler/image_downloader.py``: streamed GET, 10 MB cap,
extension inference, collision-free filenames) to corpus scale:

- ``media_refs_from_docs``: project the corpus' interleaved image spans to a
  media-fetch worklist (doc_id, media_ref, alt).
- ``MediaFetcher``: actor-pool stage producing deterministic synthetic
  bytes per ref with the reference's size-cap semantics
  (``image_downloader.py:122-124``: content-length over cap -> failed row).
- ``MediaDecoder``: the decode/feature stage. ``backend="real"`` decodes
  ACTUAL PNG and GIF pixels via the pure-stdlib codecs
  (:mod:`crawlray.pipelines.png` / :mod:`crawlray.pipelines.gif` —
  no PIL/cv2 needed); ``backend="fake"`` (oracle default)
  derives deterministic (width, height, feature hash) from the bytes;
  ``backend="stub"`` now marks ONLY the JPEG/ffmpeg decode point. The
  Ray-side plumbing (schema, batch size, actor signature, output layout)
  is identical across backends.

Batches are kept SMALL (``batch_size<=64``) because rows carry megabyte
binaries — a batch x concurrency must fit the worker heap (ray_guide:
memory-aware sizing).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_MEDIA_BYTES = 10 * 1024 * 1024  # image_downloader.py:13-15


def decode_image_real(payload: bytes):
    """REAL pixel decode dispatch for the ``backend='real'`` seam:
    PNG (:mod:`crawlray.pipelines.png`) and GIF
    (:mod:`crawlray.pipelines.gif`) decode to (h, w, c) uint8 via the
    pure-stdlib codecs; anything else returns None (the caller's
    error-row/drop contract). JPEG remains the documented stub."""
    from .gif import GifFormatError, decode_gif, is_gif
    from .png import PngFormatError, decode_png, is_png

    try:
        if is_png(payload):
            return decode_png(payload)
        if is_gif(payload):
            return decode_gif(payload)
    except (PngFormatError, GifFormatError):
        return None
    return None


def media_refs_from_docs(docs: pa.Table) -> pa.Table:
    """Explode image spans -> (doc_id, media_ref, alt) worklist rows."""
    spans = docs["spans"]
    chunks = spans.chunks if isinstance(spans, pa.ChunkedArray) else [spans]
    doc_ids_all = docs["doc_id"].to_pylist()
    out_doc, out_ref, out_alt = [], [], []
    row0 = 0
    for lst in chunks:
        offsets = lst.offsets.to_numpy()
        flat = lst.flatten()
        mask = pc.equal(flat.field("kind"), "image").to_numpy(zero_copy_only=False)
        parents = np.repeat(np.arange(len(lst)), np.diff(offsets))[mask]
        refs = flat.field("media_ref").filter(pa.array(mask)).to_pylist()
        alts = flat.field("text").filter(pa.array(mask)).to_pylist()
        out_doc.extend(doc_ids_all[row0 + p] for p in parents)
        out_ref.extend(refs)
        out_alt.extend(alts)
        row0 += len(lst)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.string()),
            "media_ref": pa.array(out_ref, pa.string()),
            "alt": pa.array(out_alt, pa.string()),
        }
    )


def infer_extension(url: str, content_type: str = "") -> str:
    """Extension from URL path, else content-type, else '.jpg'
    (image_downloader.py:53-79)."""
    path = url.split("?")[0].split("#")[0]
    dot = path.rfind(".")
    slash = path.rfind("/")
    if dot > slash and len(path) - dot <= 5:
        return path[dot:].lower()
    ct = content_type.lower()
    for key, ext in (("png", ".png"), ("gif", ".gif"), ("webp", ".webp"),
                     ("svg", ".svg"), ("jpeg", ".jpg"), ("jpg", ".jpg")):
        if key in ct:
            return ext
    return ".jpg"


class MediaFetcher:
    """Actor-pool fetch of media refs -> binary column (synthetic bytes)."""

    def __init__(self, seed: int = 42, max_bytes: int = MAX_MEDIA_BYTES):
        self.seed = seed
        self.max_bytes = max_bytes

    def _bytes_for(self, ref: str) -> bytes | None:
        h = hashlib.blake2b(f"{self.seed}|{ref}".encode(), digest_size=8).digest()
        size = 256 + int.from_bytes(h[:4], "little") % 4096
        if int.from_bytes(h[4:], "little") % 100 == 0:
            size = self.max_bytes + 1          # oversize exercise
        if size > self.max_bytes:
            return None
        reps = (size // 8) + 1
        return (h * reps)[:size]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        payloads, status, sizes = [], [], []
        for ref in refs:
            data = self._bytes_for(ref)
            if data is None:
                payloads.append(None)
                status.append("too_large")     # size-cap contract
                sizes.append(0)
            else:
                payloads.append(data)
                status.append("ok")
                sizes.append(len(data))
        return batch.append_column("payload", pa.array(payloads, pa.binary())) \
            .append_column("media_status", pa.array(status, pa.string())) \
            .append_column("n_bytes", pa.array(sizes, pa.int64())) \
            .append_column(
                "ext", pa.array([infer_extension(r) for r in refs], pa.string())
            )


class MediaDecoder:
    """Decode / feature-extract stage.

    - ``backend='fake'`` (oracle default): deterministic metadata from
      payload bytes — the plumbing-test path.
    - ``backend='real'``: ACTUAL pixel decode for PNG and GIF payloads
      via the pure-stdlib codecs (:mod:`crawlray.pipelines.png` /
      :mod:`crawlray.pipelines.gif`) — real width/height, feature =
      blake2b of the decoded pixel buffer. Reproduces the reference's real-image-bytes behavior
      (``image_downloader.py:101-138``) without PIL/cv2. Non-PNG or
      out-of-profile payloads produce width=height=0, feature='' rows
      (the error-row contract, same as null payloads).
    - ``backend='stub'``: marks ONLY the JPEG/ffmpeg decode point now —
      formats whose codecs genuinely aren't in this container."""

    def __init__(self, backend: str = "fake"):
        assert backend in ("fake", "real", "stub")
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "stub":
            raise NotImplementedError(
                "JPEG/ffmpeg decode requires libs not in this container; "
                "PNG decodes for real via backend='real'"
            )
        widths, heights, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            if not payload:
                widths.append(0)
                heights.append(0)
                feats.append("")
                continue
            if self.backend == "real":
                px = decode_image_real(payload)
                if px is None:
                    widths.append(0)
                    heights.append(0)
                    feats.append("")
                    continue
                widths.append(px.shape[1])
                heights.append(px.shape[0])
                feats.append(hashlib.blake2b(px.tobytes(),
                                             digest_size=8).hexdigest())
            else:
                h = hashlib.blake2b(payload, digest_size=8).digest()
                widths.append(16 + h[0] * 8)
                heights.append(16 + h[1] * 8)
                feats.append(h.hex())
        return batch.drop_columns(["payload"]) \
            .append_column("width", pa.array(widths, pa.int32())) \
            .append_column("height", pa.array(heights, pa.int32())) \
            .append_column("feature", pa.array(feats, pa.string()))


PHASH_ID_MOD = 2305843009213693951     # 2^61 - 1, the md5-upper-8 oracle prime


class PHasher:
    """Perceptual-hash (dHash) stage over image payloads — the image leg
    of the near-duplicate family: a 64-bit signature whose Hamming
    distance tracks visual similarity, banded into 4 x 16-bit keys so
    pairs feed :func:`crawlray.pipelines.dedup.banded_hamming_pairs`
    unchanged. Three backends:

    - ``'fake'`` (oracle default): derives the 9x8 gray grid
      deterministically from the payload — and, to make the fake behave
      like a real corpus (re-encodes/resizes of one source image hash
      NEAR each other, unrelated images hash far apart), the grid is a
      per-FAMILY base (family = payload hash mod ``n_families``) with
      one payload-determined cell perturbation: family members land
      within Hamming <= 4 of each other, cross-family distances ~32.
    - ``'real'``: the ACTUAL dHash — decode PNG/GIF pixels via the
      pure-stdlib codecs, BT.601 luma,
      box-average resize to a 9-wide x 8-tall grid, bit = left cell >
      right cell. Undecodable payloads are dropped like null payloads.
    - ``'stub'``: marks ONLY the JPEG/ffmpeg decode point.

    Output per ok row: doc_id (md5-upper-8 of the media_ref under the
    ``phash-v1`` salt mod 2^61-1 — the repo's id contract, so a DuckDB
    oracle can re-derive it), media_ref, simhash (the dHash as int64),
    sh_band0..3. Failed fetches (null payload) are dropped."""

    def __init__(self, backend: str = "fake", n_families: int = 24,
                 salt: str = "phash-v1"):
        assert backend in ("fake", "real", "stub")
        self.backend = backend
        self.n_families = n_families
        self.salt = salt

    def _fake_grid(self, payload: bytes) -> bytes:
        fam = hashlib.blake2b(payload, digest_size=8, salt=b"phash-fam").digest()
        f = bytes([fam[0] % self.n_families])
        base = (hashlib.blake2b(f, digest_size=64, salt=b"phash-base").digest()
                + hashlib.blake2b(f, digest_size=8, salt=b"phash-tail").digest())
        grid = bytearray(base)                          # 72 = 9 x 8 cells
        # one strongly perturbed "re-encode" cell: large delta so the two
        # adjacent comparisons flip ~half the time -> intra-family pairs
        # spread over Hamming 0..4 (exercising the verify, and the >3
        # exclusion) instead of collapsing to 0
        pos = fam[1] % 72
        grid[pos] = (grid[pos] + 64 + fam[2] % 128) % 256
        return bytes(grid)

    @staticmethod
    def dhash64(grid: bytes) -> int:
        """dHash: bit r*8+c set iff row-major cell (r, c) > (r, c+1)
        over a 9-wide, 8-tall gray grid (72 bytes)."""
        g = np.frombuffer(grid, np.uint8).reshape(8, 9)
        bits = (g[:, :8] > g[:, 1:]).astype(np.uint64).ravel()
        return int((bits << np.arange(64, dtype=np.uint64)).sum())

    def _real_grid(self, payload: bytes) -> bytes | None:
        """PNG/GIF payload -> 72-byte 9x8 gray grid (real decode), or
        None if the payload is not a decodable image."""
        from .png import resize_box, to_gray

        px = decode_image_real(payload)
        if px is None:
            return None
        grid = resize_box(to_gray(px), 8, 9)
        return np.clip(np.rint(grid), 0, 255).astype(np.uint8).tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "stub":
            raise NotImplementedError(
                "JPEG/ffmpeg dHash requires libs not in this container; "
                "PNG hashes for real via backend='real'"
            )
        from ..util import md5_id_bucket

        refs, sigs = [], []
        for ref, payload in zip(batch["media_ref"].to_pylist(),
                                batch["payload"].to_pylist()):
            if not payload:
                continue
            grid = (self._real_grid(payload) if self.backend == "real"
                    else self._fake_grid(payload))
            if grid is None:
                continue
            refs.append(ref)
            sigs.append(self.dhash64(grid))
        sh = np.array(sigs, np.uint64) if sigs else np.empty(0, np.uint64)
        ids = md5_id_bucket(self.salt, refs, PHASH_ID_MOD)
        out = {"doc_id": pa.array(ids, pa.int64()),
               "media_ref": pa.array(refs, pa.string()),
               "simhash": pa.array(sh.astype(np.int64), pa.int64())}
        for band in range(4):
            out[f"sh_band{band}"] = pa.array(
                ((sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64),
                pa.int64())
        return pa.table(out)


class AudioChunker:
    """Audio chunk/feature stage — the audio leg of the multimodal
    family (image: MediaDecoder, video: VideoFrameSampler): one INPUT
    row (a binary audio payload) fans out to N OUTPUT rows, one per
    fixed-stride chunk, each carrying the per-chunk features a training
    pipeline filters on (start offset, duration, an RMS-like loudness
    int, a feature hash for chunk-level dedup).

    ``backend='fake'`` derives a deterministic chunk count (1-4) and
    per-chunk features from the payload bytes (no audio libs in this
    container); ``backend='stub'`` raises NotImplementedError where a
    real ffmpeg/librosa decode would go. The Ray-side plumbing is real:
    binary rows in, fixed-width chunk records out, payloads dropped at
    the stage boundary. Failed fetches (null payload) emit zero
    chunks."""

    CHUNK_MS = 2000

    def __init__(self, backend: str = "fake", max_chunks: int = 4):
        assert backend in ("fake", "stub")
        self.backend = backend
        self.max_chunks = max_chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "stub":
            raise NotImplementedError(
                "real audio decode requires ffmpeg/librosa which are not "
                "available; use backend='fake' for deterministic plumbing"
            )
        doc_ids, refs, idxs, starts, durs, rms, feats = ([] for _ in range(7))
        for doc_id, ref, payload in zip(
            batch["doc_id"].to_pylist(),
            batch["media_ref"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if not payload:
                continue
            h = hashlib.blake2b(payload, digest_size=8).digest()
            n_chunks = 1 + h[3] % self.max_chunks
            for i in range(n_chunks):
                ch = hashlib.blake2b(
                    payload + i.to_bytes(4, "big"), digest_size=8
                ).digest()
                doc_ids.append(doc_id)
                refs.append(ref)
                idxs.append(i)
                starts.append(i * self.CHUNK_MS)
                # last chunk runs short, like a real container tail
                durs.append(self.CHUNK_MS if i < n_chunks - 1
                            else 500 + h[4] * 4)
                rms.append(int.from_bytes(ch[:2], "big"))
                feats.append(ch.hex())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "chunk_idx": pa.array(idxs, pa.int32()),
            "start_ms": pa.array(starts, pa.int64()),
            "duration_ms": pa.array(durs, pa.int64()),
            "rms": pa.array(rms, pa.int64()),
            "chunk_feature": pa.array(feats, pa.string()),
        })


class VideoFrameSampler:
    """Frame-sampling stage for video-typed media payloads: one INPUT row
    (a binary container) fans out to N OUTPUT rows (one per sampled
    frame) — the flat_map-shaped multimodal stage an LLM-data pipeline
    needs for frame-level dedup / captioning / filtering.

    ``backend='fake'`` derives a deterministic frame count (1-5) and
    per-frame feature hash from the payload bytes (no video libs in this
    container); ``backend='stub'`` raises NotImplementedError where a
    real ffmpeg/cv2 decode would go. Either way the Ray-side plumbing is
    real: binary rows in, frame rows out, payloads dropped on output so
    only fixed-width frame records travel downstream. Rows whose fetch
    failed (null payload) emit zero frames."""

    def __init__(self, backend: str = "fake", max_frames: int = 5):
        assert backend in ("fake", "stub")
        self.backend = backend
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "stub":
            raise NotImplementedError(
                "real video decode requires ffmpeg/cv2 which are not "
                "available; use backend='fake' for deterministic plumbing"
            )
        doc_ids, refs, idxs, ts, feats = [], [], [], [], []
        for doc_id, ref, payload in zip(
            batch["doc_id"].to_pylist(),
            batch["media_ref"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if not payload:
                continue
            h = hashlib.blake2b(payload, digest_size=8).digest()
            n_frames = 1 + h[2] % self.max_frames
            for i in range(n_frames):
                fh = hashlib.blake2b(
                    payload + i.to_bytes(4, "little"), digest_size=8
                ).hexdigest()
                doc_ids.append(doc_id)
                refs.append(ref)
                idxs.append(i)
                ts.append(i * 1000)
                feats.append(fh)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "ts_ms": pa.array(ts, pa.int64()),
            "frame_feature": pa.array(feats, pa.string()),
        })


class PngCorpusFetcher:
    """Synthetic REAL-PNG corpus fetcher for the media-at-scale bench:
    each ref deterministically maps to a (family, variant) pair and the
    payload is an actual encoded PNG (``png.encode_png``) of the family
    base image under that variant — identity, +brightness, or sparse
    pixel noise — so the downstream ``PHasher(backend='real')`` funnel
    sees a corpus with genuine near-duplicate structure at whatever
    scale the bench asks for. Family bases derive from per-family
    seeded RNG (lazy, no per-actor precompute), so memory per actor
    stays O(one image) no matter how many families exist.

    ``family_size`` controls near-dup density: family id =
    ref_index // family_size."""

    def __init__(self, n_families: int, h: int = 96, w: int = 128,
                 seed: int = 42):
        self.n_families = max(1, n_families)
        self.h, self.w, self.seed = h, w, seed

    def _base(self, fam: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 1_000_003 + fam)
        return rng.integers(0, 256, (self.h, self.w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .png import encode_png

        fams = batch["family"].to_numpy(zero_copy_only=False)
        variants = batch["variant"].to_numpy(zero_copy_only=False)
        payloads = []
        for fam, var in zip(fams, variants):
            base = self._base(int(fam))
            v = int(var) % 3
            if v == 1:                        # uniform brightness shift
                img = np.clip(base.astype(np.int16) + 5, 0, 255) \
                    .astype(np.uint8)
            elif v == 2:                      # sparse pixel noise
                img = base.copy()
                rng = np.random.default_rng(int(fam) * 7 + int(var))
                ys = rng.integers(0, self.h, 8)
                xs = rng.integers(0, self.w, 8)
                img[ys, xs] = 255 - img[ys, xs]
            else:
                img = base
            payloads.append(encode_png(img))
        return batch.append_column("payload",
                                   pa.array(payloads, pa.binary()))


def phash_payload_isolation(n_refs: int, family_size: int = 8,
                            concurrency: int = 8) -> dict:
    """Media-at-scale drive: real-PNG corpus -> real dHash ->
    banded Hamming pairing, with BLOCK-SIZE INSTRUMENTATION proving the
    binary payloads never enter an exchange — the 100 TB design claim
    (payloads stay inside the fetch->hash actor chain; only fixed-width
    signatures shuffle) measured instead of asserted.

    Returns {n_refs, n_pairs, payload_bytes, exchange_bytes,
    exchange_fraction, sig_columns}: ``payload_bytes`` is the
    materialized size of the payload-bearing dataset, ``exchange_bytes``
    the materialized size of what actually feeds the pairing exchange.
    """
    import ray.data as rd

    from ..util import md5_id_bucket
    from .dedup import banded_hamming_pairs

    n_fam = max(1, n_refs // family_size)

    def worklist(batch: dict) -> pa.Table:
        ids = batch["id"]
        return pa.table({
            "media_ref": pa.array(
                [f"http://img.bench/f{int(i) // family_size}/v{int(i)}.png"
                 for i in ids], pa.string()),
            "family": pa.array([int(i) // family_size for i in ids],
                               pa.int64()),
            "variant": pa.array([int(i) % family_size for i in ids],
                                pa.int64()),
        })

    work = (rd.range(n_refs, override_num_blocks=max(concurrency * 2, 8))
            .map_batches(worklist, batch_format="numpy"))
    fetched = work.map_batches(
        PngCorpusFetcher(n_families=n_fam), batch_format="pyarrow",
        batch_size=64, concurrency=concurrency).materialize()
    payload_bytes = fetched.size_bytes()
    sigs = fetched.map_batches(
        PHasher(backend="real"), batch_format="pyarrow",
        batch_size=64, concurrency=concurrency).materialize()
    exchange_bytes = sigs.size_bytes()
    sig_cols = sigs.schema().names
    assert "payload" not in sig_cols, "payload leaked past the hash stage"
    n_pairs = banded_hamming_pairs(sigs, max_hamming=3).count()
    return {
        "n_refs": n_refs,
        "n_pairs": int(n_pairs),
        "payload_bytes": int(payload_bytes),
        "exchange_bytes": int(exchange_bytes),
        "exchange_fraction": round(exchange_bytes / max(payload_bytes, 1), 6),
        "sig_columns": sig_cols,
    }


class GifCorpusFetcher:
    """Synthetic REAL-GIF corpus fetcher (the GIF twin of
    :class:`PngCorpusFetcher`): each ref deterministically maps to a
    (family, variant) palette image; variant 0 is the plain encoding,
    variant 1 the SAME pixels interlaced (must decode identically),
    variant 2 a brightness-rotated palette. Payloads are actual GIF89a
    bytes from :func:`crawlray.pipelines.gif.encode_gif`."""

    def __init__(self, h: int = 24, w: int = 32, seed: int = 7):
        self.h, self.w, self.seed = h, w, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .gif import encode_gif

        payloads = []
        for fam, var in zip(
                batch["family"].to_numpy(zero_copy_only=False),
                batch["variant"].to_numpy(zero_copy_only=False)):
            rng = np.random.default_rng(self.seed * 999_983 + int(fam))
            pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
            idx = rng.integers(0, 64, (self.h, self.w), dtype=np.uint8)
            v = int(var) % 3
            if v == 1:
                payloads.append(encode_gif(idx, pal, interlace=True))
            elif v == 2:
                pal2 = np.clip(pal.astype(np.int16) + 7, 0, 255) \
                    .astype(np.uint8)
                payloads.append(encode_gif(idx, pal2))
            else:
                payloads.append(encode_gif(idx, pal))
        return batch.append_column("payload",
                                   pa.array(payloads, pa.binary()))

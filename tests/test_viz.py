"""Renderer and colormap tests (small meshes, CPU platform)."""

import numpy as np


def _sphere():
    from craniofacialsd_vae_tpu.geometry.synthetic import octasphere
    return octasphere(2)


class TestRenderer:
    def test_renders_nonempty_image(self):
        from craniofacialsd_vae_tpu.viz.renderer import render_mesh

        verts, faces = _sphere()
        img = render_mesh(verts, faces, image_size=64)
        assert img.shape == (64, 64, 3)
        # the unit sphere seen from dist 2.5 covers a real chunk of pixels
        coverage = (img.sum(axis=-1) > 0).mean()
        assert 0.1 < coverage < 0.9
        assert img.max() <= 1.0 and img.min() >= 0.0

    def test_shadeless_uses_raw_colors(self):
        from craniofacialsd_vae_tpu.viz.renderer import render_mesh

        verts, faces = _sphere()
        colors = np.tile([1.0, 0.0, 0.0], (len(verts), 1))
        img = render_mesh(verts, faces, colors, image_size=64,
                          shadeless=True)
        hit = img[img.sum(axis=-1) > 0]
        np.testing.assert_allclose(hit[:, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(hit[:, 1], 0.0, atol=1e-5)

    def test_batch_render_matches_single(self):
        from craniofacialsd_vae_tpu.viz.renderer import (render_batch,
                                                         render_mesh)

        verts, faces = _sphere()
        batch = np.stack([verts, verts * 0.9])
        imgs = render_batch(batch, faces, image_size=64, max_vmap=2)
        single = render_mesh(verts, faces, image_size=64)
        np.testing.assert_allclose(imgs[0], single, atol=1e-5)

    def test_batch_render_partial_subbatch(self):
        from craniofacialsd_vae_tpu.viz.renderer import render_batch

        verts, faces = _sphere()
        batch = np.stack([verts] * 5)        # 5 % max_vmap(4) != 0
        imgs = render_batch(batch, faces, image_size=32, max_vmap=4)
        assert imgs.shape == (5, 32, 32, 3)
        np.testing.assert_allclose(imgs[4], imgs[0], atol=1e-5)

    def test_image_grid(self):
        from craniofacialsd_vae_tpu.viz.renderer import make_image_grid

        imgs = np.random.default_rng(0).random((6, 8, 8, 3)).astype(
            np.float32)
        grid = make_image_grid(imgs, nrow=3, padding=2)
        assert grid.shape == (2 * (8 + 2) + 2, 3 * (8 + 2) + 2, 3)


class TestColors:
    def test_errors_to_colors(self):
        from craniofacialsd_vae_tpu.viz.colors import errors_to_colors

        vals = np.linspace(0, 5, 10)
        cols = errors_to_colors(vals, 0, 5, "plasma")
        assert cols.shape == (10, 3) and cols.dtype == np.uint8
        assert not np.array_equal(cols[0], cols[-1])


class TestPallasRaster:
    """The Pallas z-buffer kernel must be pixel-equivalent to the portable
    XLA rasterizer (interpret mode here; the real-TPU parity + ~9× speedup
    are exercised on hardware)."""

    def test_matches_portable_rasterizer(self):
        import jax.numpy as jnp
        from craniofacialsd_vae_tpu.viz.renderer import (_rasterize,
                                                         look_at_camera)
        from craniofacialsd_vae_tpu.viz.raster_pallas import \
            rasterize_pallas

        verts, faces = _sphere()
        rng = np.random.default_rng(0)
        cols = rng.random(verts.shape).astype(np.float32)
        eye, rot = look_at_camera()
        vc = jnp.asarray((verts - eye) @ rot.T, jnp.float32)
        fj = jnp.asarray(faces, jnp.int32)
        cj = jnp.asarray(cols)

        ref = np.asarray(_rasterize(vc, fj, cj, image_size=64))
        pal = np.asarray(rasterize_pallas(vc, fj, cj, image_size=64,
                                          interpret=True))
        np.testing.assert_allclose(pal, ref, atol=1e-4)

    def test_background_and_misses(self):
        import jax.numpy as jnp
        from craniofacialsd_vae_tpu.viz.raster_pallas import \
            rasterize_pallas

        # one tiny triangle in front of the camera; everything else misses
        v = jnp.asarray([[-.1, -.1, 0.], [.1, -.1, 0.], [0., .1, 0.]])
        eye_shift = v + jnp.asarray([0., 0., -2.0])   # camera frame
        f = jnp.asarray([[0, 1, 2]], jnp.int32)
        c = jnp.ones((3, 3))
        img = np.asarray(rasterize_pallas(eye_shift, f, c, image_size=32,
                                          background=0.25,
                                          interpret=True))
        assert np.isclose(img.min(), 0.25)            # background hit
        assert img.max() > 0.9                        # triangle rendered


class TestNativeRaster:
    """The native C++ scanline rasterizer (geometry/native.py
    rasterize_native — the CPU demo's render path) must be
    pixel-equivalent to the portable XLA rasterizer."""

    def _skip_without_lib(self):
        import pytest

        from craniofacialsd_vae_tpu.geometry.native import \
            rasterize_available
        if not rasterize_available():
            pytest.skip("native library not built (make -C native)")

    def test_matches_portable_rasterizer(self):
        import os

        self._skip_without_lib()
        from craniofacialsd_vae_tpu.viz import renderer as R

        verts, faces = _sphere()
        rng = np.random.default_rng(0)
        cols = rng.random(verts.shape).astype(np.float32)
        prev = os.environ.get("CFSDVAE_NATIVE_RASTER")
        try:
            os.environ["CFSDVAE_NATIVE_RASTER"] = "0"
            R._NATIVE_STATE["ok"] = None
            ref = R.render_mesh(verts, faces, cols, image_size=64)
            os.environ["CFSDVAE_NATIVE_RASTER"] = "1"
            R._NATIVE_STATE["ok"] = None
            nat = R.render_mesh(verts, faces, cols, image_size=64)
        finally:
            if prev is None:
                os.environ.pop("CFSDVAE_NATIVE_RASTER", None)
            else:
                os.environ["CFSDVAE_NATIVE_RASTER"] = prev
            R._NATIVE_STATE["ok"] = None
        # identical math modulo fp32-vs-fp64 accumulation: no pixel may
        # move by a visible amount
        assert np.abs(ref - nat).max() < 1e-3

    def test_batch_matches_single_and_background(self):
        self._skip_without_lib()
        from craniofacialsd_vae_tpu.viz.renderer import (_render_one_native,
                                                         look_at_camera,
                                                         render_batch,
                                                         render_mesh)

        verts, faces = _sphere()
        batch = np.stack([verts, verts * 1.05]).astype(np.float32)
        imgs = render_batch(batch, faces, image_size=48, background=0.25)
        single = render_mesh(batch[0], faces, image_size=48)
        assert np.allclose(imgs[0],
                           np.where(single == 0.0, 0.25, single),
                           atol=1e-3) or np.abs(imgs[0] - single).mean() \
            < 0.05  # background differs (0.25 vs 0.0) only off-mesh
        eye, rot = look_at_camera()
        img = _render_one_native(
            batch[0], np.asarray(faces, np.int64),
            np.full(verts.shape, 0.5, np.float32), eye, rot,
            (0.0, 0.0, 3.0), 48, False, 0.25)
        assert np.allclose(np.asarray(img)[0, 0], 0.25)  # background px


class TestMJPEGVideo:
    """viz/video.py — the self-contained AVI writer that keeps the
    reference's video artifact family alive without ffmpeg. No AVI
    reader exists in this image, so validation parses the RIFF
    structure directly and decodes the embedded JPEG frames."""

    def test_write_parse_decode_roundtrip(self, tmp_path):
        import io
        import struct

        from PIL import Image

        from craniofacialsd_vae_tpu.viz.video import write_mjpeg_avi

        # smooth gradients (JPEG-friendly; raw noise is maximally
        # quantization-hostile and would fail any pixel tolerance)
        yy, xx = np.mgrid[0:48, 0:64]
        base = np.stack([yy * 4, xx * 3, (yy + xx) * 2],
                        axis=-1).astype(np.uint8)
        frames = np.stack([(base * (1 - i / 8)).astype(np.uint8)
                           for i in range(6)])
        path = str(tmp_path / "clip.avi")
        write_mjpeg_avi(path, frames, fps=4)

        data = open(path, "rb").read()
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
        pos, jpegs, idx = 12, [], None
        while pos < len(data):
            cc = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            payload = data[pos + 8:pos + 8 + size]
            if cc == b"LIST" and payload[:4] == b"movi":
                q = 4
                while q < size:
                    sub = payload[q:q + 4]
                    sz = struct.unpack("<I", payload[q + 4:q + 8])[0]
                    if sub == b"00dc":
                        jpegs.append(payload[q + 8:q + 8 + sz])
                    q += 8 + sz + (sz % 2)
            elif cc == b"idx1":
                idx = payload
            pos += 8 + size + (size % 2)
        assert len(jpegs) == 6
        assert idx is not None and len(idx) // 16 == 6
        for j, orig in zip(jpegs, frames):
            img = np.asarray(Image.open(io.BytesIO(j)))
            assert img.shape == orig.shape
            # JPEG-lossy but recognizably the same frame
            assert np.abs(img.astype(int) - orig.astype(int)).mean() < 8

    def test_tester_fallback_prefers_avi(self, tmp_path):
        from craniofacialsd_vae_tpu.analysis.tester import Tester

        frames = np.zeros((3, 16, 16, 3), np.float32)
        Tester._write_video(str(tmp_path / "vid.mp4"), frames, fps=2)
        # no ffmpeg in this image → the self-contained AVI is written
        assert (tmp_path / "vid.avi").exists() \
            or (tmp_path / "vid.mp4").exists()

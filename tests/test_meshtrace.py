"""Bounce-synchronous streamed-mesh sampler tests (CPU interpret mode).

ops/pallas_meshtrace: per-bounce kernel launches over Morton-sorted
sample-interleaved lanes, MXU pair-compaction between bounces, banded
one-hot restore.  Oracles: (a) statistical agreement with the wavefront
integrator (same contract as every megakernel test), (b) BIT-exactness
of compact=True vs compact=False — the hash PRNG is keyed by the
lane-id row, which rides the permutation, so the compaction machinery
must be an exact permutation or colors change bitwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.core import materials
from raytracing_in_one_weekend_tpu.models import meshes
from raytracing_in_one_weekend_tpu.ops import pallas_megatrace, pallas_meshtrace
from raytracing_in_one_weekend_tpu.render import film, renderer
from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder
from raytracing_in_one_weekend_tpu.utils.config import CameraSettings


def _stream_scene():
    b = SceneBuilder()
    b.add_sphere((0.0, -1000.0, 0.0), 1000.0, b.lambert((0.5, 0.5, 0.5)))
    v, f, n, _ = meshes.icosphere(4)  # 5120 > TRI_MAX: streamed
    b.add_mesh(v, f, b.metal((0.8, 0.7, 0.5), glossiness=0.9),
               normals=n, translation=(0.0, 1.0, 0.0))
    b.set_gradient_sky()
    scene = b.build()
    cs = CameraSettings(
        origin=(0.0, 2.5, 7.0), look_at=(0.0, 0.7, 0.0),
        vertical_fov=35.0, focus_distance=7.0,
    )
    return scene, cs


def _run(scene, camera, w, h, s, d, **kw):
    packed = materials.pack_materials(scene)
    stream = pallas_megatrace.pack_tri_stream_tables(scene, packed)
    return pallas_meshtrace.sample_batch_sync(
        jnp.full((w * h,), s, jnp.int32), jnp.zeros((w * h,)),
        camera, jax.random.PRNGKey(1),
        scene.spheres.center, scene.spheres.radius,
        pallas_megatrace.pack_sphere_records(scene, packed),
        scene.environment.sky_bottom, scene.environment.sky_top,
        stream, width=w, height=h, samples=s, trace_depth=d,
        has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
        interpret=True, **kw,
    )


class TestBounceSyncMesh:
    def test_matches_wavefront_statistically(self):
        w = h = 16
        s, d = 4, 5
        scene, cs = _stream_scene()
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            aperture=cs.aperture, focus_distance=cs.focus_distance,
        )
        ref, mref = renderer.render_batch(
            scene, camera, film.zero_accumulators(w * h),
            jax.random.PRNGKey(0),
            width=w, height=h, samples=s, trace_depth=d,
        )
        out = _run(scene, camera, w, h, s, d)
        assert float(jnp.mean(out["count"])) == pytest.approx(
            float(jnp.mean(ref.sample_count)), rel=0.05
        )
        assert float(jnp.mean(out["color"])) == pytest.approx(
            float(jnp.mean(ref.color)), rel=0.08
        )
        assert float(jnp.mean(jnp.abs(out["normal"]))) == pytest.approx(
            float(jnp.mean(jnp.abs(ref.normal))), rel=0.08
        )
        assert float(jnp.sum(out["rays"])) == pytest.approx(
            float(mref.total_rays), rel=0.08
        )

    def test_compaction_is_exact_permutation(self):
        # multi-tile wave (64x16 x 4 spp = 4 RAY_TILEs): pair compaction
        # + banded restore vs no compaction must agree BITWISE
        w, h = 64, 16
        s, d = 4, 5
        scene, cs = _stream_scene()
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            aperture=cs.aperture, focus_distance=cs.focus_distance,
        )
        a = _run(scene, camera, w, h, s, d, compact=False)
        b = _run(scene, camera, w, h, s, d, compact=True)
        for k in a:
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k

    def test_renderer_routes_streamed_mesh(self, monkeypatch):
        # the renderer dispatch sends streamed-mesh scenes (> TRI_MAX,
        # white noise, no volumes/motion) to the bounce-sync path
        from raytracing_in_one_weekend_tpu.ops import pallas_sphere

        called = {}
        real = pallas_meshtrace.sample_batch_sync

        def spy(*a, **kw):
            called["yes"] = True
            return real(*a, **kw, interpret=True)

        w = h = 16
        s, d = 2, 3
        scene, cs = _stream_scene()
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            aperture=cs.aperture, focus_distance=cs.focus_distance,
        )
        monkeypatch.setattr(pallas_meshtrace, "sample_batch_sync", spy)
        monkeypatch.setattr(
            pallas_meshtrace, "SYNC_TRI_MIN", pallas_megatrace.TRI_MAX
        )  # production threshold is 65536 (perf-routed); the test mesh
        # is 5120 tris
        monkeypatch.setattr(pallas_sphere, "use_pallas", lambda: True)
        pallas_megatrace.FORCE_INTERPRET = True
        try:
            acc, _ = renderer.render_batch(
                scene, camera, film.zero_accumulators(w * h),
                jax.random.PRNGKey(0),
                width=w, height=h, samples=s, trace_depth=d,
                differentiable=False,
            )
        finally:
            pallas_megatrace.FORCE_INTERPRET = False
        assert called.get("yes")
        assert bool(jnp.all(jnp.isfinite(acc.color)))

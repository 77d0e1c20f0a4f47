"""Tape-replay differentiable fused path (ops/megatrace_replay).

Oracle 1: the jnp replay of the kernel's tape reproduces the kernel's own
color/count outputs (same PRNG, same branch rules — only float
reassociation differs).
Oracle 2: custom_vjp gradients match finite differences of the primal
(the kernel forward), the same validation gate as tests/test_grad.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.core import camera as camera_mod
from raytracing_in_one_weekend_tpu.core import materials
from raytracing_in_one_weekend_tpu.models import book_scenes
from raytracing_in_one_weekend_tpu.ops import megatrace_replay, pallas_megatrace


def _force_interpret(monkeypatch):
    """Route every Pallas kernel the renderer may trace (including the
    AOV-graft wavefront's select kernels) through interpret mode — the
    dispatch-forcing tests stub use_pallas on CPU."""
    from raytracing_in_one_weekend_tpu.ops import (
        pallas_sphere, pallas_triangle,
    )

    monkeypatch.setattr(pallas_megatrace, "FORCE_INTERPRET", True)
    monkeypatch.setattr(pallas_sphere, "FORCE_INTERPRET", True)
    monkeypatch.setattr(pallas_triangle, "FORCE_INTERPRET", True)


def _setup(scene_fn, w, h):
    scene, cs = scene_fn()
    camera = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
        aperture=cs.aperture, focus_distance=cs.focus_distance,
    )
    packed = materials.pack_materials(scene)
    records = jnp.concatenate(
        [
            packed[scene.spheres.material][:, :11],
            scene.spheres.material[:, None].astype(jnp.float32),
        ],
        axis=1,
    )
    return scene, camera, records


class TestReplayParity:
    @pytest.mark.parametrize("scene_fn", [
        book_scenes.three_spheres, book_scenes.single_sphere,
    ])
    def test_replay_reproduces_kernel(self, scene_fn):
        w = h = 24
        s, d = 4, 6
        scene, camera, records = _setup(scene_fn, w, h)
        assert megatrace_replay.replay_eligible(scene)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        out = pallas_megatrace.sample_batch(
            lane_count, jnp.zeros((w * h,)), cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(13), samples=s, trace_depth=d,
            has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
            hw_prng=False, want_tape=True, interpret=True,
        )
        csum, cnt = megatrace_replay.replay(
            out["tape"], lane_count, cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(13), samples=s, trace_depth=d,
            has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
        )
        np.testing.assert_allclose(
            np.asarray(cnt), np.asarray(out["count"]), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(csum), np.asarray(out["color"]), rtol=2e-4,
            atol=2e-4,
        )

    def test_gradients_match_finite_differences(self):
        # interior-masked loss (tests/test_grad.py protocol): silhouette
        # boundary terms are excluded, so common-random-number FD
        # differentiates the same smooth estimator the detached-decision
        # VJP computes
        from raytracing_in_one_weekend_tpu.diff import gradcheck

        w = h = 24
        s, d = 4, 4
        scene, camera, records = _setup(book_scenes.single_sphere, w, h)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        mask = np.zeros((h, w), np.float32)
        mask[9:15, 9:15] = 1.0  # strictly inside the silhouette
        mask = jnp.asarray(mask.reshape(-1))

        def loss(centers):
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                centers, scene.spheres.radius, records,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(5), samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
                jitter=False, interpret=True,
            )
            img = out["color"] / jnp.maximum(out["count"], 1.0)[:, None]
            sq = jnp.sum(img**2, axis=-1)
            return jnp.sum(sq * mask) / jnp.sum(mask)

        report = gradcheck.check_grads(
            loss, scene.spheres.center, eps=1e-3, rtol=0.15, atol=2e-3
        )
        assert report["cosine"] > 0.99, report
        assert report["rel_err"] < 0.15, report

    def test_radius_gradients_match_finite_differences(self):
        from raytracing_in_one_weekend_tpu.diff import gradcheck

        w = h = 24
        s, d = 4, 4
        scene, camera, records = _setup(book_scenes.single_sphere, w, h)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        mask = np.zeros((h, w), np.float32)
        mask[9:15, 9:15] = 1.0
        mask = jnp.asarray(mask.reshape(-1))

        def loss(radii):
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                scene.spheres.center, radii, records,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(5), samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
                jitter=False, interpret=True,
            )
            img = out["color"] / jnp.maximum(out["count"], 1.0)[:, None]
            sq = jnp.sum(img**2, axis=-1)
            return jnp.sum(sq * mask) / jnp.sum(mask)

        report = gradcheck.check_grads(
            loss, scene.spheres.radius, eps=1e-3, rtol=0.15, atol=2e-3
        )
        assert report["cosine"] > 0.99, report

    def test_albedo_gradients_flow(self):
        w = h = 12
        s, d = 2, 4
        scene, camera, records = _setup(book_scenes.single_sphere, w, h)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)

        def loss(recs):
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                scene.spheres.center, scene.spheres.radius, recs,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(3), samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
                interpret=True,
            )
            return jnp.mean(out["color"])

        g = jax.grad(loss)(records)
        # albedo rows (cols 1-3) of some material must have signal
        assert float(jnp.max(jnp.abs(g[:, 1:4]))) > 1e-6


def _mixed_scene():
    """Sphere + rect + box testbed exercising every replay entity kind."""
    from raytracing_in_one_weekend_tpu.scene.scene import (
        SceneBuilder, axis_angle_quat,
    )

    b = SceneBuilder()
    blue = b.lambert((0.2, 0.3, 0.7))
    white = b.lambert((0.73, 0.73, 0.73))
    gold = b.metal((0.9, 0.8, 0.6), glossiness=0.9)
    b.add_sphere((0.0, 0.0, -1.0), 0.5, blue)
    b.add_rect((0.0, -0.5, -1.0), (4.0, 4.0), white,
               rotation=axis_angle_quat((1, 0, 0), -90.0))  # floor
    b.add_box((1.1, -0.25, -1.2), (0.5, 0.5, 0.5), gold,
              rotation=axis_angle_quat((0, 1, 0), 30.0))
    return b.build()


def _aux_setup(scene, w, h, *, origin=(0, 0, 1), look=(0, 0, -1), fov=60.0):
    camera = camera_mod.make_camera(
        jnp.asarray(origin, jnp.float32), jnp.asarray(look, jnp.float32),
        jnp.asarray([0.0, 1.0, 0.0]), fov, w / h,
    )
    packed = materials.pack_materials(scene)
    records = pallas_megatrace.pack_sphere_records(scene, packed)
    rect_t, box_t = pallas_megatrace.pack_aux_tables(scene, packed)
    return camera, packed, records, rect_t, box_t


class TestReplayRectBox:
    """Rect/box tape-replay scope (Cornell-class differentiable scenes)."""

    @pytest.mark.parametrize("scene_case", ["mixed", "cornell"])
    def test_replay_reproduces_kernel(self, scene_case):
        w = h = 24
        s, d = 3, 5
        if scene_case == "mixed":
            scene = _mixed_scene()
            camera, _, records, rect_t, box_t = _aux_setup(scene, w, h)
            sky_on = True
        else:
            scene, cs = book_scenes.cornell_box()
            camera = camera_mod.make_camera(
                cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
                focus_distance=cs.focus_distance,
            )
            packed = materials.pack_materials(scene)
            records = pallas_megatrace.pack_sphere_records(scene, packed)
            rect_t, box_t = pallas_megatrace.pack_aux_tables(scene, packed)
            sky_on = False
        assert megatrace_replay.replay_eligible(scene)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        out = pallas_megatrace.sample_batch(
            lane_count, jnp.zeros((w * h,)), cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(13), rect_tables=rect_t, box_tables=box_t,
            samples=s, trace_depth=d,
            has_dielectrics=scene.flags.has_dielectrics, sky_on=sky_on,
            hw_prng=False, want_tape=True, interpret=True,
        )
        csum, cnt = megatrace_replay.replay(
            out["tape"], lane_count, cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(13), rect_t, box_t,
            samples=s, trace_depth=d,
            has_dielectrics=scene.flags.has_dielectrics, sky_on=sky_on,
        )
        np.testing.assert_allclose(
            np.asarray(cnt), np.asarray(out["count"]), atol=0
        )
        # cornell emission reaches 15, so tolerances are relative-first
        np.testing.assert_allclose(
            np.asarray(csum), np.asarray(out["color"]), rtol=2e-4,
            atol=2e-3,
        )

    def test_center_gradients_with_aux_kinds_match_fd(self):
        # sphere-center FD in a scene that ALSO contains rects/boxes:
        # the aux kinds must not corrupt the smooth sphere gradient
        from raytracing_in_one_weekend_tpu.diff import gradcheck

        w = h = 24
        s, d = 3, 4
        scene = _mixed_scene()
        camera, _, records, rect_t, box_t = _aux_setup(scene, w, h)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        mask = np.zeros((h, w), np.float32)
        mask[10:14, 10:14] = 1.0  # strictly inside the sphere silhouette
        mask = jnp.asarray(mask.reshape(-1))

        def loss(centers):
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                centers, scene.spheres.radius, records,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(5), rect_tables=rect_t, box_tables=box_t,
                samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
                jitter=False, interpret=True,
            )
            img = out["color"] / jnp.maximum(out["count"], 1.0)[:, None]
            sq = jnp.sum(img**2, axis=-1)
            return jnp.sum(sq * mask) / jnp.sum(mask)

        report = gradcheck.check_grads(
            loss, scene.spheres.center, eps=1e-3, rtol=0.15, atol=2e-3
        )
        assert report["cosine"] > 0.99, report

    def test_cornell_light_emission_gradients_match_fd(self):
        # the classic Cornell inverse target: light radiance.  Emission
        # perturbations move no boundaries, so FD is clean even without
        # an interior mask.
        from raytracing_in_one_weekend_tpu.diff import gradcheck

        w = h = 16
        s, d = 2, 4
        scene, cs = book_scenes.cornell_box()
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            focus_distance=cs.focus_distance,
        )
        packed0 = materials.pack_materials(scene)
        light_id = int(scene.rects.material[5])
        assert float(packed0[light_id, 4]) == 15.0  # emissive row sanity
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)

        def loss(em):
            packed = packed0.at[light_id, 4:7].set(em)
            records = pallas_megatrace.pack_sphere_records(scene, packed)
            rect_t, box_t = pallas_megatrace.pack_aux_tables(scene, packed)
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                scene.spheres.center, scene.spheres.radius, records,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(3), rect_tables=rect_t, box_tables=box_t,
                samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics, sky_on=False,
                jitter=False, interpret=True,
            )
            img = out["color"] / jnp.maximum(out["count"], 1.0)[:, None]
            return jnp.mean(img)

        report = gradcheck.check_grads(
            loss, jnp.asarray([15.0, 15.0, 15.0]), eps=5e-2, rtol=0.1,
            atol=1e-4,
        )
        assert report["cosine"] > 0.999, report
        assert report["rel_err"] < 0.05, report

    def test_cornell_wall_albedo_gradients_flow(self):
        w = h = 12
        s, d = 2, 4
        scene, cs = book_scenes.cornell_box()
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            focus_distance=cs.focus_distance,
        )
        packed0 = materials.pack_materials(scene)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)

        def loss(packed):
            records = pallas_megatrace.pack_sphere_records(scene, packed)
            rect_t, box_t = pallas_megatrace.pack_aux_tables(scene, packed)
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                scene.spheres.center, scene.spheres.radius, records,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(3), rect_tables=rect_t, box_tables=box_t,
                samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics, sky_on=False,
                jitter=False, interpret=True,
            )
            return jnp.mean(out["color"])

        g = jax.grad(loss)(packed0)
        # albedo rows (cols 1-3) of the lambert walls must carry signal
        assert float(jnp.max(jnp.abs(g[:, 1:4]))) > 1e-6
        # and the emissive light's emission rows (cols 4-6) as well
        assert float(jnp.max(jnp.abs(g[:, 4:7]))) > 1e-6


def test_replay_ior_score_gradient_matches_wavefront():
    """The replay mirrors the wavefront's lottery score terms: both
    paths' d/d_ior on the same scene/loss must estimate the same
    gradient (the wavefront's was FD-validated in test_grad; detached
    replay decisions measured ~10x under)."""
    from raytracing_in_one_weekend_tpu.core import materials as mats_mod
    from raytracing_in_one_weekend_tpu.render import renderer

    # drop ~190 prior tests' live executables before the suite's biggest
    # CPU compile (the wavefront-grad jit below segfaulted the XLA CPU
    # backend only in full-suite runs; see conftest stack-limit note)
    jax.clear_caches()

    w = h = 20
    s, d = 8, 6
    scene, cs = book_scenes.three_spheres()
    camera = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
        focus_distance=cs.focus_distance,
    )
    cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
    lane_count = jnp.full((w * h,), s, jnp.int32)
    die_idx = int(np.argwhere(np.asarray(scene.materials.type) == 1)[0, 0])

    def replay_mean(param_tbl, seed):
        s2 = scene._replace(
            materials=scene.materials._replace(parameter=param_tbl)
        )
        packed = mats_mod.pack_materials(s2)
        records = pallas_megatrace.pack_sphere_records(s2, packed)
        out = megatrace_replay.sample_batch_diff(
            lane_count, jnp.zeros((w * h,)), cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(seed), samples=s, trace_depth=d,
            has_dielectrics=True, sky_on=True, jitter=False,
            interpret=True,
        )
        img = out["color"] / jnp.maximum(out["count"], 1.0)[:, None]
        return jnp.mean(img)

    def wave_mean(param_tbl, key):
        s2 = scene._replace(
            materials=scene.materials._replace(parameter=param_tbl)
        )
        return jnp.mean(
            renderer.render_image(
                s2, camera, key, width=w, height=h,
                samples_per_pixel=96, trace_depth=d,
            ).color
        )

    p0 = scene.materials.parameter
    g_rep = np.mean([
        float(jax.grad(replay_mean)(p0, 100 + k)[die_idx]) for k in range(4)
    ])
    g_wav = np.mean([
        float(
            jax.jit(jax.grad(wave_mean))(p0, jax.random.PRNGKey(k))[die_idx]
        )
        for k in range(4)
    ])
    assert np.isfinite(g_rep) and np.isfinite(g_wav)
    assert np.sign(g_rep) == np.sign(g_wav), (g_rep, g_wav)
    assert abs(g_rep - g_wav) < max(0.6 * abs(g_wav), 1.5e-3), (g_rep, g_wav)


def test_renderer_diff_fused_dispatch(monkeypatch):
    """render_batch's differentiable fused branch must run end-to-end.

    Regression: the Morton streamed-triangle commit pasted a
    `tri_stream_tables` reorder into the diff branch where that name is
    never bound, so every TPU differentiable render died with
    UnboundLocalError at dispatch.  Forces the branch on CPU by stubbing
    use_pallas + interpret-mode kernels."""
    import functools

    from raytracing_in_one_weekend_tpu.ops import pallas_sphere
    from raytracing_in_one_weekend_tpu.render import film, renderer

    monkeypatch.setattr(pallas_sphere, "use_pallas", lambda: True)
    _force_interpret(monkeypatch)
    orig = megatrace_replay.sample_batch_diff
    monkeypatch.setattr(
        megatrace_replay, "sample_batch_diff",
        functools.partial(orig, interpret=True),
    )
    w = h = 12
    scene, camera, _ = _setup(book_scenes.three_spheres, w, h)
    acc = film.zero_accumulators(w * h)
    acc2, metrics = renderer.render_batch(
        scene, camera, acc, jax.random.PRNGKey(0),
        width=w, height=h, samples=2, trace_depth=4,
        differentiable=True,
    )
    assert float(jnp.max(acc2.sample_count)) > 0
    assert float(metrics.total_rays) > 0


# ---------------------------------------------------------------------------
# Triangle-mesh scope (VMEM-resident meshes in the diff-fused path)
# ---------------------------------------------------------------------------


def _mesh_scene():
    """Ground sphere + smooth icosphere + face-normal cube (every triangle
    normal mode), mirroring tests/test_megakernel.TestTriangleKernel."""
    from raytracing_in_one_weekend_tpu.models import meshes
    from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    b.add_sphere((0.0, -1000.0, 0.0), 1000.0, b.lambert((0.5, 0.5, 0.5)))
    v, f, n, _ = meshes.icosphere(1)
    b.add_mesh(v, f, b.metal((0.8, 0.7, 0.5), glossiness=0.9),
               normals=n, translation=(-1.2, 1.0, 0.0))
    v, f, _, _ = meshes.cube()
    b.add_mesh(v, f, b.lambert((0.8, 0.3, 0.2)),
               translation=(1.2, 0.5, 0.0), face_normals=True)
    b.set_gradient_sky()
    return b.build()


def _smooth_triangle_scene():
    """One triangle with DISTINCT per-vertex normals over a ground sphere:
    interior vertex motion shifts the barycentrics, hence the interpolated
    shading normal, hence the radiance — a smooth signal finite
    differences can measure (face-normal meshes have ~zero interior
    vertex gradient by construction; their signal is the silhouette
    boundary term, diff/boundary's job)."""
    import numpy as np

    from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    b.add_sphere((0.0, -1000.0, 0.0), 1000.0, b.lambert((0.1, 0.7, 0.1)))
    v = np.asarray(
        [[-1.5, 0.3, 0.0], [1.5, 0.5, 0.0], [0.0, 2.2, -1.0]], np.float32
    )
    f = np.asarray([[0, 1, 2]], np.int32)
    n = np.asarray(
        [[0.6, 0.6, 0.52], [-0.6, 0.6, 0.52], [0.0, 0.2, 0.98]], np.float32
    )
    n = n / np.linalg.norm(n, axis=1, keepdims=True)
    b.add_mesh(v, f, b.lambert((0.8, 0.4, 0.2)), normals=n)
    b.set_gradient_sky()
    return b.build()


def test_aov_loss_flows_photometric_ok(monkeypatch):
    """Round 3 asserted AOV losses RAISE at trace time (the replay
    propagates only color/count cotangents); round 4's renderer grafts
    a differentiable-wavefront AOV term onto the fused branch, so an
    AOV loss must now produce finite nonzero gradients instead —
    matching tests/test_grad.py::TestAOVFallback, which additionally
    proves exact equality with the pure wavefront.  The raise survives
    only for DIRECT sample_batch_diff callers (the backstop)."""
    import functools

    from raytracing_in_one_weekend_tpu.ops import pallas_sphere
    from raytracing_in_one_weekend_tpu.render import film, renderer

    monkeypatch.setattr(pallas_sphere, "use_pallas", lambda: True)
    _force_interpret(monkeypatch)
    orig = megatrace_replay.sample_batch_diff
    monkeypatch.setattr(
        megatrace_replay, "sample_batch_diff",
        functools.partial(orig, interpret=True),
    )
    w = h = 12
    scene, camera, _ = _setup(book_scenes.three_spheres, w, h)

    def render_acc(centers):
        from raytracing_in_one_weekend_tpu.diff import params as params_mod

        s = params_mod.apply_params(scene, {"sphere_centers": centers})
        acc, _ = renderer.render_batch(
            s, camera, film.zero_accumulators(w * h), jax.random.PRNGKey(0),
            width=w, height=h, samples=2, trace_depth=4,
            differentiable=True,
        )
        return acc

    # photometric (color/count) losses flow
    g = jax.grad(
        lambda c: jnp.sum(
            render_acc(c).color
            / jnp.maximum(render_acc(c).sample_count, 1.0)[:, None]
        )
    )(scene.spheres.center)
    assert bool(jnp.any(g != 0.0))

    # AOV-regularized losses flow via the wavefront graft (no raise)
    g_aov = jax.grad(lambda c: jnp.sum(render_acc(c).normal))(
        scene.spheres.center
    )
    assert bool(jnp.all(jnp.isfinite(g_aov)))
    assert bool(jnp.any(g_aov != 0.0))


class TestReplayTriangles:
    def test_replay_reproduces_kernel_mesh(self):
        w = h = 24
        s, d = 4, 6
        scene = _mesh_scene()
        assert megatrace_replay.replay_eligible(scene)
        camera = camera_mod.make_camera(
            jnp.asarray([0.0, 2.0, 6.0]), jnp.asarray([0.0, 0.7, 0.0]),
            jnp.asarray([0.0, 1.0, 0.0]), 35.0, 1.0,
            focus_distance=6.0,
        )
        packed = materials.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        tri_t = pallas_megatrace.pack_tri_tables(scene, packed)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        out = pallas_megatrace.sample_batch(
            lane_count, jnp.zeros((w * h,)), cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(13), tri_tables=tri_t, samples=s, trace_depth=d,
            has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
            hw_prng=False, want_tape=True, interpret=True,
        )
        csum, cnt = megatrace_replay.replay(
            out["tape"], lane_count, cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(13), tri_tables=tri_t, samples=s, trace_depth=d,
            has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
        )
        np.testing.assert_allclose(
            np.asarray(cnt), np.asarray(out["count"]), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(csum), np.asarray(out["color"]), rtol=2e-4,
            atol=2e-4,
        )

    def test_vertex_gradients_match_finite_differences(self):
        from raytracing_in_one_weekend_tpu.diff import gradcheck
        from raytracing_in_one_weekend_tpu.diff import params as params_mod

        w = h = 24
        s, d = 4, 4
        scene = _smooth_triangle_scene()
        camera = camera_mod.make_camera(
            jnp.asarray([0.0, 1.0, 4.0]), jnp.asarray([0.0, 1.0, 0.0]),
            jnp.asarray([0.0, 1.0, 0.0]), 45.0, 1.0,
        )
        packed = materials.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)

        # interior mask from a 1-bounce tape: pixels whose winner is the
        # triangle, eroded so FD never crosses the silhouette
        out0 = pallas_megatrace.sample_batch(
            lane_count, jnp.zeros((w * h,)), cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(5),
            tri_tables=pallas_megatrace.pack_tri_tables(scene, packed),
            samples=1, trace_depth=1,
            has_dielectrics=False, sky_on=True, hw_prng=False,
            want_tape=True, interpret=True, jitter=False,
        )
        s_pad = pallas_megatrace.sphere_pad_count(
            scene.spheres.center.shape[0]
        )
        tri_win = (np.asarray(out0["tape"])[0] >= s_pad).reshape(h, w)
        er = np.zeros_like(tri_win)
        er[2:-2, 2:-2] = (
            tri_win[2:-2, 2:-2]
            & tri_win[:-4, 2:-2] & tri_win[4:, 2:-2]
            & tri_win[2:-2, :-4] & tri_win[2:-2, 4:]
        )
        assert er.sum() > 10
        mask = jnp.asarray(er.reshape(-1).astype(np.float32))

        def loss(verts):
            sc = params_mod.set_triangle_vertices(scene, verts)
            tg = pallas_megatrace.pack_tri_tables(sc, packed)
            o = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                sc.spheres.center, sc.spheres.radius, records,
                sc.environment.sky_bottom, sc.environment.sky_top,
                jnp.int32(5), tri_tables=tg, samples=s, trace_depth=d,
                has_dielectrics=False, sky_on=True, jitter=False,
                interpret=True,
            )
            img = o["color"] / jnp.maximum(o["count"], 1.0)[:, None]
            return jnp.sum(jnp.sum(img**2, axis=-1) * mask) / jnp.sum(mask)

        verts0 = params_mod.extract_params(
            scene, ("triangle_vertices",)
        )["triangle_vertices"]
        report = gradcheck.check_grads(
            loss, verts0, eps=1e-3, rtol=0.2, atol=3e-3
        )
        assert report["cosine"] > 0.99, report
        assert report["rel_err"] < 0.1, report

    def test_renderer_dispatches_mesh_to_diff_fused(self, monkeypatch):
        import functools

        from raytracing_in_one_weekend_tpu.ops import pallas_sphere
        from raytracing_in_one_weekend_tpu.render import film, renderer

        monkeypatch.setattr(pallas_sphere, "use_pallas", lambda: True)
        _force_interpret(monkeypatch)
        orig = megatrace_replay.sample_batch_diff
        called = {}

        def spy(*a, **k):
            called["hit"] = True
            return orig(*a, **k, interpret=True)

        monkeypatch.setattr(megatrace_replay, "sample_batch_diff", spy)
        w = h = 12
        scene = _mesh_scene()
        camera = camera_mod.make_camera(
            jnp.asarray([0.0, 2.0, 6.0]), jnp.asarray([0.0, 0.7, 0.0]),
            jnp.asarray([0.0, 1.0, 0.0]), 35.0, 1.0,
        )
        acc = film.zero_accumulators(w * h)
        acc2, metrics = renderer.render_batch(
            scene, camera, acc, jax.random.PRNGKey(0),
            width=w, height=h, samples=2, trace_depth=4,
            differentiable=True,
        )
        assert called.get("hit"), "mesh scene did not take the diff-fused path"
        assert float(jnp.max(acc2.sample_count)) > 0
        assert float(metrics.total_rays) > 0

    def test_normal_gradients_flow_end_to_end(self):
        """triangle_normals is an optimizable parameter: gradients reach
        scene.triangles.normals through BOTH integrators' barycentric
        lerps (wavefront here on CPU; the replay covers it via the
        pack_tri_tables rec rows in the FD test above)."""
        from raytracing_in_one_weekend_tpu.diff import params as params_mod
        from raytracing_in_one_weekend_tpu.render import renderer

        w = h = 16
        scene = _smooth_triangle_scene()
        camera = camera_mod.make_camera(
            jnp.asarray([0.0, 1.0, 4.0]), jnp.asarray([0.0, 1.0, 0.0]),
            jnp.asarray([0.0, 1.0, 0.0]), 45.0, 1.0,
        )

        def loss(nrm):
            s = params_mod.apply_params(scene, {"triangle_normals": nrm})
            img = renderer.render_image(
                s, camera, jax.random.PRNGKey(0), width=w, height=h,
                samples_per_pixel=2, trace_depth=3,
            ).color
            return jnp.mean(img)

        n0 = params_mod.extract_params(scene, ("triangle_normals",))[
            "triangle_normals"
        ]
        g = jax.grad(loss)(n0)
        gn = np.asarray(g)
        assert np.isfinite(gn).all()
        assert float(np.abs(gn).max()) > 1e-6


# ---------------------------------------------------------------------------
# Volume + motion scope (convex volume walk / unit-shutter motion blur)
# ---------------------------------------------------------------------------


def _run_parity(scene, cs, *, w=20, h=20, s=4, d=6, seed=13):
    """kernel (interpret, want_tape) vs replay on the same scene."""
    from raytracing_in_one_weekend_tpu.core import materials as mats_mod

    camera = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
        aperture=cs.aperture, focus_distance=cs.focus_distance,
    )
    packed = mats_mod.pack_materials(scene)
    records = pallas_megatrace.pack_sphere_records(scene, packed)
    rect_t, box_t = pallas_megatrace.pack_aux_tables(scene, packed)
    vol0 = (
        pallas_megatrace.camera_containment_row(scene, packed, camera.origin)
        if scene.flags.has_volumes else None
    )
    mv = scene.spheres.move_offset if scene.flags.has_motion else None
    lane_count = jnp.full((w * h,), s, jnp.int32)
    cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
    out = pallas_megatrace.sample_batch(
        lane_count, jnp.zeros((w * h,)), cam_row,
        scene.spheres.center, scene.spheres.radius, records,
        scene.environment.sky_bottom, scene.environment.sky_top,
        jnp.int32(seed), rect_tables=rect_t, box_tables=box_t,
        vol0=vol0, move_offsets=mv,
        samples=s, trace_depth=d,
        has_dielectrics=scene.flags.has_dielectrics,
        sky_on=scene.flags.sky == 1,
        hw_prng=False, want_tape=True, interpret=True,
    )
    csum, cnt = megatrace_replay.replay(
        out["tape"], lane_count, cam_row,
        scene.spheres.center, scene.spheres.radius, records,
        scene.environment.sky_bottom, scene.environment.sky_top,
        jnp.int32(seed), rect_t, box_t, None, None, mv, vol0,
        samples=s, trace_depth=d,
        has_dielectrics=scene.flags.has_dielectrics,
        sky_on=scene.flags.sky == 1,
    )
    return out, csum, cnt


class TestReplayVolumesMotion:
    @pytest.mark.parametrize("scene_name", ["volume", "cover_motion"])
    def test_replay_reproduces_kernel(self, scene_name):
        scene, cs = book_scenes.SCENES[scene_name]()
        assert megatrace_replay.replay_eligible(scene)
        out, csum, cnt = _run_parity(scene, cs)
        np.testing.assert_allclose(
            np.asarray(cnt), np.asarray(out["count"]), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(csum), np.asarray(out["color"]), rtol=2e-4, atol=2e-4
        )

    def test_replay_reproduces_kernel_cornell_volumes(self):
        from raytracing_in_one_weekend_tpu.models import testbeds

        scene, cs = testbeds.SCENES["cornell_volumes"]()
        assert megatrace_replay.replay_eligible(scene)
        out, csum, cnt = _run_parity(scene, cs, s=2, d=6)
        np.testing.assert_allclose(
            np.asarray(cnt), np.asarray(out["count"]), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(csum), np.asarray(out["color"]), rtol=2e-4, atol=2e-4
        )

    def test_motion_gradients_match_finite_differences(self):
        """d/d_move_offset through the diff-fused path: the shutter-time
        draw is parameter-independent, so interior-masked CRN FD
        differentiates the same smooth estimator (test_grad protocol)."""
        from raytracing_in_one_weekend_tpu.core import materials as mats_mod
        from raytracing_in_one_weekend_tpu.diff import gradcheck
        from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder

        w = h = 24
        s, d = 4, 4
        b = SceneBuilder()
        lam = b.lambert((0.2, 0.5, 0.8))
        ground = b.lambert((0.5, 0.5, 0.5))
        b.add_sphere((0.0, 0.0, -1.0), 0.5, lam,
                     move_offset=(0.05, 0.08, 0.0))
        b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
        b.set_gradient_sky()
        scene = b.build()
        camera = camera_mod.make_camera(
            jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]),
            jnp.asarray([0.0, 1.0, 0.0]), 90.0, 1.0,
        )
        packed = mats_mod.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        mask = np.zeros((h, w), np.float32)
        mask[10:14, 10:14] = 1.0  # inside the silhouette across the sweep
        mask = jnp.asarray(mask.reshape(-1))

        def loss(move):
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                scene.spheres.center, scene.spheres.radius, records,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(5), move_vectors=move,
                samples=s, trace_depth=d,
                has_dielectrics=False, sky_on=True,
                jitter=False, interpret=True,
            )
            img = out["color"] / jnp.maximum(out["count"], 1.0)[:, None]
            sq = jnp.sum(img**2, axis=-1)
            return jnp.sum(sq * mask) / jnp.sum(mask)

        report = gradcheck.check_grads(
            loss, scene.spheres.move_offset, eps=1e-3, rtol=0.15, atol=2e-3
        )
        assert report["cosine"] > 0.99, report
        assert report["rel_err"] < 0.15, report

    def test_density_score_gradient_matches_wavefront(self):
        """d/d_density rides the Beer-Lambert free-path score terms (the
        wavefront's were FD-validated in test_grad); both estimators on
        the same scene/loss must agree (detached decisions alone measured
        d/d_density ~ 0)."""
        from raytracing_in_one_weekend_tpu.core import materials as mats_mod
        from raytracing_in_one_weekend_tpu.render import renderer

        jax.clear_caches()
        w = h = 20
        s, d = 8, 6
        scene, cs = book_scenes.SCENES["volume"]()
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            focus_distance=cs.focus_distance,
        )
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        lane_count = jnp.full((w * h,), s, jnp.int32)
        vol_idx = int(
            np.argwhere(np.asarray(scene.materials.type) == 2)[0, 0]
        )

        def replay_mean(param_tbl, seed):
            s2 = scene._replace(
                materials=scene.materials._replace(parameter=param_tbl)
            )
            packed = mats_mod.pack_materials(s2)
            records = pallas_megatrace.pack_sphere_records(s2, packed)
            vol0 = pallas_megatrace.camera_containment_row(
                s2, packed, camera.origin
            )
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                scene.spheres.center, scene.spheres.radius, records,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(seed), vol0=vol0,
                samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics, sky_on=True,
                jitter=False, interpret=True,
            )
            img = out["color"] / jnp.maximum(out["count"], 1.0)[:, None]
            return jnp.mean(img)

        def wave_mean(param_tbl, key):
            s2 = scene._replace(
                materials=scene.materials._replace(parameter=param_tbl)
            )
            return jnp.mean(
                renderer.render_image(
                    s2, camera, key, width=w, height=h,
                    samples_per_pixel=96, trace_depth=d,
                ).color
            )

        p0 = scene.materials.parameter
        g_rep = np.mean([
            float(jax.grad(replay_mean)(p0, 300 + k)[vol_idx])
            for k in range(4)
        ])
        g_wav = np.mean([
            float(
                jax.jit(jax.grad(wave_mean))(
                    p0, jax.random.PRNGKey(50 + k)
                )[vol_idx]
            )
            for k in range(4)
        ])
        assert np.isfinite(g_rep) and np.isfinite(g_wav)
        assert np.sign(g_rep) == np.sign(g_wav), (g_rep, g_wav)
        assert abs(g_rep - g_wav) < max(0.6 * abs(g_wav), 1.5e-3), (
            g_rep, g_wav,
        )

    def test_renderer_dispatches_volume_motion_to_diff_fused(
        self, monkeypatch
    ):
        """Volume and motion scenes now take the diff-fused branch."""
        import functools

        from raytracing_in_one_weekend_tpu.ops import pallas_sphere
        from raytracing_in_one_weekend_tpu.render import film, renderer

        monkeypatch.setattr(pallas_sphere, "use_pallas", lambda: True)
        _force_interpret(monkeypatch)
        called = {}
        orig = megatrace_replay.sample_batch_diff

        def spy(*a, **k):
            called["hit"] = True
            return orig(*a, **k, interpret=True)

        monkeypatch.setattr(megatrace_replay, "sample_batch_diff", spy)
        for name in ("volume", "cover_motion"):
            called.clear()
            scene, cs = book_scenes.SCENES[name]()
            w = h = 12
            camera = camera_mod.make_camera(
                cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
                focus_distance=cs.focus_distance,
            )
            acc = film.zero_accumulators(w * h)
            acc2, metrics = renderer.render_batch(
                scene, camera, acc, jax.random.PRNGKey(0),
                width=w, height=h, samples=2, trace_depth=4,
                differentiable=True,
            )
            assert called.get("hit"), f"{name} did not take diff-fused"
            assert float(jnp.max(acc2.sample_count)) > 0


class TestReplayCubemap:
    """Cubemap-sky scope: miss radiance fetches the environment map
    in-kernel; the replay mirrors the major-axis face select with a
    detached texel index, so environment-map texel gradients flow from
    exactly the rays that missed into each texel."""

    def _setup(self):
        from raytracing_in_one_weekend_tpu.core import (
            materials as mats_mod,
        )
        from raytracing_in_one_weekend_tpu.models import testbeds

        w = h = 20
        scene, cs = testbeds.SCENES["cubemap"]()
        assert megatrace_replay.replay_eligible(scene)
        cam = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            aperture=cs.aperture, focus_distance=cs.focus_distance,
        )
        packed = mats_mod.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        rect_t, box_t = pallas_megatrace.pack_aux_tables(scene, packed)
        cube, cdims = pallas_megatrace.pack_cubemap_table(scene)
        return scene, cam, records, rect_t, box_t, cube, cdims, w, h

    def test_replay_reproduces_kernel(self):
        scene, cam, records, rect_t, box_t, cube, cdims, w, h = (
            self._setup()
        )
        s, d = 4, 5
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(cam, w, h)
        out = pallas_megatrace.sample_batch(
            lane_count, jnp.zeros((w * h,)), cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(13), rect_tables=rect_t, box_tables=box_t,
            cube_table=cube, cube_dims=cdims,
            samples=s, trace_depth=d,
            has_dielectrics=scene.flags.has_dielectrics,
            sky_on=False, hw_prng=False, want_tape=True, interpret=True,
        )
        csum, cnt = megatrace_replay.replay(
            out["tape"], lane_count, cam_row,
            scene.spheres.center, scene.spheres.radius, records,
            scene.environment.sky_bottom, scene.environment.sky_top,
            jnp.int32(13), rect_t, box_t, None, None, None, None, cube,
            samples=s, trace_depth=d,
            has_dielectrics=scene.flags.has_dielectrics,
            sky_on=False, cube_dims=cdims,
        )
        np.testing.assert_allclose(
            np.asarray(cnt), np.asarray(out["count"]), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(csum), np.asarray(out["color"]), rtol=2e-4,
            atol=2e-4,
        )

    def test_envmap_texel_gradient_matches_fd(self):
        """Single-texel FD: the env-map gather is exact per texel (under
        CRN the miss set is texel-value-independent), so AD == FD to
        float precision — the texture_atlas precedent."""
        scene, cam, records, rect_t, box_t, cube, cdims, w, h = (
            self._setup()
        )
        s, d = 2, 4
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(cam, w, h)

        def loss(cube):
            o = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), cam_row,
                scene.spheres.center, scene.spheres.radius, records,
                scene.environment.sky_bottom, scene.environment.sky_top,
                jnp.int32(5), rect_tables=rect_t, box_tables=box_t,
                cube_table=cube, cube_dims=cdims,
                samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics,
                sky_on=False, jitter=False, interpret=True,
            )
            img = o["color"] / jnp.maximum(o["count"], 1.0)[:, None]
            return jnp.mean(img)

        g = np.asarray(jax.grad(loss)(cube))
        assert np.isfinite(g).all()
        assert (np.abs(g) > 0).sum() > 100  # many texels see rays
        idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)
        eps = 0.05
        cp = cube.at[idx].add(eps)
        cm = cube.at[idx].add(-eps)
        fd = (float(loss(cp)) - float(loss(cm))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-3, atol=1e-7)

    def test_renderer_dispatches_cubemap_to_diff_fused(self, monkeypatch):
        import functools

        from raytracing_in_one_weekend_tpu.models import testbeds
        from raytracing_in_one_weekend_tpu.ops import pallas_sphere
        from raytracing_in_one_weekend_tpu.render import film, renderer

        monkeypatch.setattr(pallas_sphere, "use_pallas", lambda: True)
        _force_interpret(monkeypatch)
        called = {}
        orig = megatrace_replay.sample_batch_diff

        def spy(*a, **k):
            called["hit"] = True
            return orig(*a, **k, interpret=True)

        monkeypatch.setattr(megatrace_replay, "sample_batch_diff", spy)
        scene, cs = testbeds.SCENES["cubemap"]()
        w = h = 12
        cam = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            focus_distance=cs.focus_distance,
        )
        acc = film.zero_accumulators(w * h)
        acc2, _ = renderer.render_batch(
            scene, cam, acc, jax.random.PRNGKey(0),
            width=w, height=h, samples=2, trace_depth=4,
            differentiable=True,
        )
        assert called.get("hit"), "cubemap scene did not take diff-fused"
        assert float(jnp.max(acc2.sample_count)) > 0


class TestKernelBackward:
    """ops/megatrace_bwd: the Pallas backward kernel's machine-derived
    adjoint must match the XLA replay's jax.vjp leaf-for-leaf (both run
    the SAME replay_iteration step; interpret mode here, the Mosaic
    compile is exercised on hardware by bench.py / the TPU suite)."""

    @staticmethod
    def _grad_pair(scene, camera, diff_leaves, fixed, *, w, h, s, d,
                   sky_on=True, seed=5):
        """jax.grad of a scalar loss wrt `diff_leaves` (dict pytree),
        once per kernel_bwd setting.  `fixed` carries the non-diff
        call kwargs."""
        lane_count = jnp.full((w * h,), s, jnp.int32)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)

        def loss(leaves, kernel_bwd):
            kw = dict(fixed)
            for k, v in leaves.items():
                kw[k] = v
            centers = kw.pop("centers", scene.spheres.center)
            radii = kw.pop("radii", scene.spheres.radius)
            records = kw.pop("records")
            sky_b = kw.pop("sky_b", scene.environment.sky_bottom)
            sky_t = kw.pop("sky_t", scene.environment.sky_top)
            crow = kw.pop("cam_row", cam_row)
            out = megatrace_replay.sample_batch_diff(
                lane_count, jnp.zeros((w * h,)), crow,
                centers, radii, records, sky_b, sky_t,
                jnp.int32(seed), samples=s, trace_depth=d,
                has_dielectrics=scene.flags.has_dielectrics,
                sky_on=sky_on, interpret=True, kernel_bwd=kernel_bwd,
                **kw,
            )
            img = out["color"] / jnp.maximum(out["count"], 1.0)[:, None]
            probe = jnp.cos(
                jnp.arange(img.size, dtype=jnp.float32).reshape(img.shape)
                * 0.37
            )
            return jnp.sum(img * probe)

        g_ref = jax.grad(lambda lv: loss(lv, False))(diff_leaves)
        g_ker = jax.grad(lambda lv: loss(lv, True))(diff_leaves)
        flat_r, _ = jax.tree.flatten_with_path(g_ref)
        flat_k, _ = jax.tree.flatten(g_ker)
        assert len(flat_r) == len(flat_k)
        for (path, a), b in zip(flat_r, flat_k):
            a, b = np.asarray(a), np.asarray(b)
            if a.size == 0:  # e.g. the sphere tables of a no-sphere scene
                continue
            scale = np.max(np.abs(a)) + 1e-10
            err = np.max(np.abs(a - b)) / scale
            assert err < 5e-4, (jax.tree_util.keystr(path), scale, err)

    def test_spheres_dielectrics_camera_sky(self):
        w = h = 20
        s, d = 3, 5
        scene, camera, records = _setup(book_scenes.three_spheres, w, h)
        from raytracing_in_one_weekend_tpu.ops import megatrace_bwd

        assert megatrace_bwd.kernel_bwd_eligible(scene)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        leaves = dict(
            centers=scene.spheres.center, radii=scene.spheres.radius,
            records=records, cam_row=cam_row,
            sky_b=scene.environment.sky_bottom,
            sky_t=scene.environment.sky_top,
        )
        self._grad_pair(scene, camera, leaves, {}, w=w, h=h, s=s, d=d)

    def test_cornell_rect_box(self):
        w = h = 16
        s, d = 2, 5
        scene, cs = book_scenes.cornell_box()
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            focus_distance=cs.focus_distance,
        )
        packed = materials.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        rect_t, box_t = pallas_megatrace.pack_aux_tables(scene, packed)
        leaves = dict(
            records=records, rect_tables=rect_t, box_tables=box_t,
        )
        self._grad_pair(
            scene, camera, leaves, {}, w=w, h=h, s=s, d=d, sky_on=False
        )

    def test_volumes_vol0_density(self):
        w = h = 16
        s, d = 2, 5
        scene, cs = book_scenes.volume_test()
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            aperture=cs.aperture, focus_distance=cs.focus_distance,
        )
        packed = materials.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        vol0 = pallas_megatrace.camera_containment_row(
            scene, packed, camera.origin
        )
        leaves = dict(records=records, vol0=vol0,
                      centers=scene.spheres.center)
        self._grad_pair(scene, camera, leaves, {}, w=w, h=h, s=s, d=d)

    def test_motion_move_vectors(self):
        from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder

        w = h = 16
        s, d = 3, 4
        b = SceneBuilder()
        b.add_sphere((0.0, 0.0, -1.0), 0.5, b.lambert((0.2, 0.5, 0.8)),
                     move_offset=(0.05, 0.08, 0.0))
        b.add_sphere((0.0, -100.5, -1.0), 100.0, b.lambert((0.5, 0.5, 0.5)))
        b.set_gradient_sky()
        scene = b.build()
        camera = camera_mod.make_camera(
            jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]),
            jnp.asarray([0.0, 1.0, 0.0]), 90.0, 1.0,
        )
        packed = materials.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        leaves = dict(records=records,
                      move_vectors=scene.spheres.move_offset,
                      centers=scene.spheres.center)
        self._grad_pair(scene, camera, leaves, {}, w=w, h=h, s=s, d=d)

    def test_mesh_triangles(self):
        w = h = 16
        s, d = 2, 4
        scene = _mesh_scene()
        camera = camera_mod.make_camera(
            jnp.asarray([0.0, 2.0, 6.0]), jnp.asarray([0.0, 0.7, 0.0]),
            jnp.asarray([0.0, 1.0, 0.0]), 35.0, 1.0, focus_distance=6.0,
        )
        packed = materials.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        tri_t = pallas_megatrace.pack_tri_tables(scene, packed)
        leaves = dict(records=records, tri_tables=tri_t)
        self._grad_pair(scene, camera, leaves, {}, w=w, h=h, s=s, d=d)

    def test_checker_texture(self):
        from raytracing_in_one_weekend_tpu.models import testbeds

        w = h = 16
        s, d = 2, 4
        scene, cs = testbeds.checkered_spheres()
        from raytracing_in_one_weekend_tpu.ops import megatrace_bwd

        assert megatrace_bwd.kernel_bwd_eligible(scene)
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            aperture=cs.aperture, focus_distance=cs.focus_distance,
        )
        packed = materials.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        tex_all = pallas_megatrace.pack_texture_tables(scene)
        assert tex_all is not None and tex_all[1] is None
        leaves = dict(records=records, tex_tables=tex_all[:3])
        self._grad_pair(scene, camera, leaves, {}, w=w, h=h, s=s, d=d)

    def test_image_atlas_texel_gradients(self):
        # round 5: atlas scenes ride the kernel backward — texel
        # cotangents via the one-hot fetch's vjp (Texture.cs:82-90)
        from raytracing_in_one_weekend_tpu.models import testbeds
        from raytracing_in_one_weekend_tpu.ops import megatrace_bwd

        w = h = 12
        s, d = 2, 4
        scene, cs = testbeds.textured_sphere()
        assert megatrace_replay.replay_eligible(scene)
        assert megatrace_bwd.kernel_bwd_eligible(scene)
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            aperture=cs.aperture, focus_distance=cs.focus_distance,
        )
        packed = materials.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        tex_all = pallas_megatrace.pack_texture_tables(scene)
        assert tex_all is not None and tex_all[2] is not None
        leaves = dict(records=records, tex_tables=tex_all[:3])
        self._grad_pair(
            scene, camera, leaves, dict(img_dims=tex_all[3]),
            w=w, h=h, s=s, d=d,
        )

    def test_cubemap_texel_gradients(self):
        # round 5: cubemap skies ride the kernel backward — env-map
        # texel cotangents via the one-hot fetch (Texture.cs:172-210)
        from raytracing_in_one_weekend_tpu.models import testbeds
        from raytracing_in_one_weekend_tpu.ops import megatrace_bwd

        w = h = 12
        s, d = 2, 4
        scene, cs = testbeds.cubemap_testbed()
        assert megatrace_replay.replay_eligible(scene)
        assert megatrace_bwd.kernel_bwd_eligible(scene)
        camera = camera_mod.make_camera(
            cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
            aperture=cs.aperture, focus_distance=cs.focus_distance,
        )
        packed = materials.pack_materials(scene)
        records = pallas_megatrace.pack_sphere_records(scene, packed)
        cube_all = pallas_megatrace.pack_cubemap_table(scene)
        leaves = dict(records=records, cube_table=cube_all[0])
        self._grad_pair(
            scene, camera, leaves, dict(cube_dims=cube_all[1]),
            w=w, h=h, s=s, d=d, sky_on=scene.flags.sky == 1,
        )


class TestKernelBackwardDeepDepth:
    """Depth >= 16 through the Pallas backward (the reference's default
    traceDepth is 35, Raytracer.cs:88): the checkpoint/re-forward mode
    engages (full_store needs iters*rows*8*128*4 bytes and depth-16
    tapes exceed the budget at real tile sizes) and the adjoint must
    still match the XLA replay leaf-for-leaf.

    ~15 min of CPU interpret-mode compile, so gated behind RTIW_SLOW=1
    (verified green 2026-08-20); the default evidence for deep-depth
    gradients is the depth-35 hardware bench row in BENCHMARKS.md plus
    tests/test_grad.py::TestDeepDepthGrad (wavefront FD, depth 16)."""

    def test_three_spheres_depth12_ungated(self):
        """Round 5: the UNGATED deep-depth check — depth 12 exceeds the
        full-store tape budget at real tile sizes, so the checkpoint/
        re-forward backward engages, and at w=8 x 1 spp the whole
        kernel-vs-XLA comparison runs in ~30-60 s (measured leaf
        agreement ~7e-8 relative).  The depth-16 variant below stays
        RTIW_SLOW-gated for the full-size configuration."""
        w = h = 8
        s, d = 1, 12
        scene, camera, records = _setup(book_scenes.three_spheres, w, h)
        from raytracing_in_one_weekend_tpu.ops import megatrace_bwd

        assert megatrace_bwd.kernel_bwd_eligible(scene)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        leaves = dict(
            centers=scene.spheres.center, radii=scene.spheres.radius,
            records=records, cam_row=cam_row,
        )
        TestKernelBackward._grad_pair(
            scene, camera, leaves, {}, w=w, h=h, s=s, d=d
        )

    @pytest.mark.skipif(
        not __import__("os").environ.get("RTIW_SLOW"),
        reason="~15 min interpret compile; set RTIW_SLOW=1",
    )
    def test_three_spheres_depth16(self):
        w = h = 12
        s, d = 1, 16  # 1 spp keeps the unrolled interpret program (and
        # its compile) half the size — depth is the thing under test
        scene, camera, records = _setup(book_scenes.three_spheres, w, h)
        from raytracing_in_one_weekend_tpu.ops import megatrace_bwd

        assert megatrace_bwd.kernel_bwd_eligible(scene)
        cam_row = pallas_megatrace.pack_camera_row(camera, w, h)
        leaves = dict(
            centers=scene.spheres.center, radii=scene.spheres.radius,
            records=records, cam_row=cam_row,
        )
        TestKernelBackward._grad_pair(
            scene, camera, leaves, {}, w=w, h=h, s=s, d=d
        )

"""Inverse-rendering demos (BASELINE.json config 4 north star).

`python -m raytracing_in_one_weekend_tpu.diff.demo [outdir]` recovers the
three-spheres scene's sphere positions and albedo colors from a rendered
target image: perturbed lambert/metal positions + washed-out albedos are
optimized by Adam through the fused-kernel tape-replay VJP
(ops/megatrace_replay) with silhouette boundary gradients
(diff/boundary).  The refractive glass pair's geometry is frozen —
refraction-dominated silhouettes are outside the primary-edge boundary
estimator's scope (diff/boundary.py docstring).

Measured on one TPU v5e chip: 200 steps in ~25s (126 ms/step at 160x160,
8 spp, depth 6 + 128 boundary samples/sphere); loss 0.039 -> 0.003;
optimized center error 0.099 -> 0.001 (lambert) / 0.082 -> 0.03 (metal);
used-albedo max error 0.200 -> 0.037.  Writes
inverse_{target,init,final}.png.

`... diff.demo [outdir] cornell` runs the classic global-illumination
inverse: recover the Cornell box's area-light radiance and wall albedos
from one rendered image.  Light transport couples every parameter to
every pixel (the red/green walls are seen mostly through indirect
bounces), so this exercises the rect/box tape-replay gradients through
multi-bounce paths.  No boundary term — emission/albedo perturbations
move no silhouettes.  Writes cornell_inverse_{target,init,final}.png.

`... diff.demo [outdir] cornell-geometry` recovers the two Cornell
boxes' positions and rotations (raw quaternions, renormalized by a
projection hook each step) through the box silhouette-edge boundary
gradients (diff/boundary.box_edge_gradients) — pose losses are
coverage-driven, so the interior gradient alone is ~0.  Writes
cornell_geo_{target,init,final}.png.

`... diff.demo [outdir] camera` answers "where was this photo taken?":
recover the camera origin and view direction from one rendered image
through diff/boundary.camera_edge_gradients (interior-only camera
gradients DIVERGE — pose losses are image-shift/silhouette driven).
Writes camera_{target,init,final}.png.

`... diff.demo [outdir] texture` paints a texture by descent: recover
the earth image on the textured sphere from one rendered view — each
texel's gradient flows from exactly the rays that sampled it (only the
visible hemisphere's texels move; the far side keeps the init).  Writes
texture_{target,init,final}.png.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(outdir: str = "gallery") -> None:
    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.diff import inverse, params as params_mod
    from raytracing_in_one_weekend_tpu.models import book_scenes
    from raytracing_in_one_weekend_tpu.render import film, renderer
    from raytracing_in_one_weekend_tpu.utils import image as image_mod

    w = h = 160
    scene, cs = book_scenes.three_spheres()
    camera = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
        aperture=cs.aperture, focus_distance=cs.focus_distance,
    )
    cfg = inverse.InverseRenderConfig(
        width=w, height=h, samples_per_pixel=8, trace_depth=6,
        learning_rate=8e-3, steps=200,
        use_boundary=True, boundary_samples=128,
    )
    key = jax.random.PRNGKey(42)

    def render(s):
        return renderer.render_image(
            s, camera, key, width=w, height=h, samples_per_pixel=64,
            trace_depth=6, differentiable=False,
        ).color

    def save(color, path):
        img = film.CombinedImage(
            color=color, normal=jnp.zeros_like(color),
            albedo=jnp.zeros_like(color),
        )
        image_mod.write_png(
            path, np.asarray(film.finalize(img, w, h)["color"])
        )

    target = render(scene)
    save(target, f"{outdir}/inverse_target.png")

    true_centers = scene.spheres.center
    true_colors = scene.textures.main_color
    rng0 = np.random.default_rng(3)
    # spheres: 0 lambert, 1 ground, 2 metal, 3 glass, 4 glass inner shell
    perturb = jnp.asarray(
        rng0.uniform(-0.12, 0.12, true_centers.shape).astype(np.float32)
    ).at[1].set(0.0).at[3].set(0.0).at[4].set(0.0)
    init = {
        "sphere_centers": true_centers + perturb,
        "texture_colors": jnp.clip(true_colors * 0.6 + 0.2, 0.0, 1.0),
    }
    mask = {
        "sphere_centers": jnp.ones_like(true_centers)
        .at[1].set(0.0).at[3].set(0.0).at[4].set(0.0),
        "texture_colors": jnp.ones_like(true_colors),
    }
    save(
        render(params_mod.apply_params(scene, init)),
        f"{outdir}/inverse_init.png",
    )

    t0 = time.perf_counter()
    final, losses = inverse.optimize(
        scene, camera, target, init, cfg, grad_mask=mask
    )
    dt = time.perf_counter() - t0
    save(
        render(params_mod.apply_params(scene, final)),
        f"{outdir}/inverse_final.png",
    )

    ce0 = np.abs(np.asarray(init["sphere_centers"] - true_centers)).max(1)
    ce1 = np.abs(np.asarray(final["sphere_centers"] - true_centers)).max(1)
    used = np.unique(
        np.asarray(scene.materials.albedo_tex[scene.spheres.material])
    )
    ae0 = np.abs(np.asarray(init["texture_colors"] - true_colors))[used].max()
    ae1 = np.abs(
        np.asarray(final["texture_colors"] - true_colors)
    )[used].max()
    print(f"steps={cfg.steps} wall={dt:.1f}s ({dt/cfg.steps*1e3:.0f} ms/step)")
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    print("per-sphere center err:", np.round(ce0, 3), "->", np.round(ce1, 3))
    print(f"used-albedo max-err {ae0:.3f} -> {ae1:.3f}")


def main_cornell(
    outdir: str = "gallery",
    *,
    size: int = 128,
    steps: int = 250,
) -> None:
    """Recover the Cornell light's radiance + wall albedos from a target
    image (texture_colors covers both: constant-texture emission and
    albedo live in the same main-color table, scene/scene.py)."""
    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.diff import inverse, params as params_mod
    from raytracing_in_one_weekend_tpu.models import book_scenes
    from raytracing_in_one_weekend_tpu.render import film, renderer
    from raytracing_in_one_weekend_tpu.utils import image as image_mod

    w = h = size
    scene, cs = book_scenes.cornell_box()
    camera = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
        focus_distance=cs.focus_distance,
    )
    # emission travels ~10/channel; Adam's per-step magnitude is ~lr, so
    # the light needs a coarser rate than the [0,1] albedos would alone
    # unbiased_l2 is load-bearing here: the enclosed box is indirect-lit
    # and very noisy at low spp, and the plain MC L2's +Var term drives
    # albedos into a dark local minimum (measured: walls 0.65 -> 0.14
    # with the light nearly correct)
    cfg = inverse.InverseRenderConfig(
        width=w, height=h, samples_per_pixel=16, trace_depth=6,
        learning_rate=6e-2, steps=steps, unbiased_l2=True,
    )
    key = jax.random.PRNGKey(7)

    def render(s):
        return renderer.render_image(
            s, camera, key, width=w, height=h, samples_per_pixel=64,
            trace_depth=6, differentiable=False,
        ).color

    def save(color, path):
        img = film.CombinedImage(
            color=color, normal=jnp.zeros_like(color),
            albedo=jnp.zeros_like(color),
        )
        image_mod.write_png(
            path, np.asarray(film.finalize(img, w, h)["color"])
        )

    target = render(scene)
    save(target, f"{outdir}/cornell_inverse_target.png")

    true_colors = scene.textures.main_color
    light_row = int(
        scene.materials.emission_tex[int(scene.rects.material[5])]
    )
    assert float(true_colors[light_row, 0]) == 15.0
    # albedo rows of the NON-emissive entity materials: the light's own
    # albedo (truth 0) is nearly unobservable — a tiny bright surface
    # reflects almost nothing of the image — so exposing it to the
    # optimizer just lets it wander to the clamp boundary
    used_mats = np.unique(
        np.asarray(
            np.concatenate([scene.rects.material, scene.boxes.material])
        )
    )
    emis = np.asarray(scene.materials.emission_tex)[used_mats]
    wall_rows = np.unique(
        np.asarray(scene.materials.albedo_tex)[used_mats[emis == 0]]
    )
    # init: dim gray light, washed-out walls
    init_colors = jnp.asarray(true_colors)
    init_colors = init_colors.at[light_row].set(5.0)
    init_colors = init_colors.at[wall_rows].set(
        jnp.clip(true_colors[wall_rows] * 0.4 + 0.3, 0.0, 1.0)
    )
    init = {"texture_colors": init_colors}
    mask_rows = np.zeros((true_colors.shape[0], 1), np.float32)
    mask_rows[wall_rows] = 1.0
    mask_rows[light_row] = 1.0
    mask = {"texture_colors": jnp.asarray(mask_rows) * jnp.ones((1, 3))}
    save(
        render(params_mod.apply_params(scene, init)),
        f"{outdir}/cornell_inverse_init.png",
    )

    # projected descent: wall albedos stay physical ([0,1]); the light
    # row stays non-negative but unbounded above.  Without the clamp the
    # emission/albedo ambiguity escapes into >1 albedos that amplify
    # radiance at every bounce (measured: albedo max-err 0.3 -> 4.6).
    wall_sel = jnp.asarray(mask_rows * 0.0).at[wall_rows].set(1.0)

    def project(params):
        c = params["texture_colors"]
        c = jnp.where(wall_sel > 0.0, jnp.clip(c, 0.0, 1.0), c)
        return {"texture_colors": jnp.clip(c, 0.0, None)}

    t0 = time.perf_counter()
    final, losses = inverse.optimize(
        scene, camera, target, init, cfg, grad_mask=mask, project=project
    )
    dt = time.perf_counter() - t0
    save(
        render(params_mod.apply_params(scene, final)),
        f"{outdir}/cornell_inverse_final.png",
    )

    tc, ic, fc = map(
        np.asarray, (true_colors, init["texture_colors"],
                     final["texture_colors"])
    )
    le0 = np.abs(ic[light_row] - tc[light_row]).max()
    le1 = np.abs(fc[light_row] - tc[light_row]).max()
    ae0 = np.abs(ic[wall_rows] - tc[wall_rows]).max()
    ae1 = np.abs(fc[wall_rows] - tc[wall_rows]).max()
    print(f"steps={cfg.steps} wall={dt:.1f}s ({dt/cfg.steps*1e3:.0f} ms/step)")
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    print(f"light radiance max-err {le0:.2f} -> {le1:.2f}")
    print(f"wall albedo max-err {ae0:.3f} -> {ae1:.3f}")


def main_cornell_geometry(
    outdir: str = "gallery",
    *,
    size: int = 96,
    steps: int = 120,
) -> None:
    """Recover the Cornell boxes' positions + rotations from a target
    image via the box silhouette-edge boundary gradients."""
    from raytracing_in_one_weekend_tpu.core import camera as camera_mod, math3
    from raytracing_in_one_weekend_tpu.diff import inverse, params as params_mod
    from raytracing_in_one_weekend_tpu.models import book_scenes
    from raytracing_in_one_weekend_tpu.render import film, renderer
    from raytracing_in_one_weekend_tpu.scene.scene import axis_angle_quat
    from raytracing_in_one_weekend_tpu.utils import image as image_mod

    w = h = size
    scene, cs = book_scenes.cornell_box()
    camera = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
        focus_distance=cs.focus_distance,
    )
    cfg = inverse.InverseRenderConfig(
        width=w, height=h, samples_per_pixel=8, trace_depth=4,
        learning_rate=5e-3, steps=steps,
        use_boundary=True, boundary_probe_spp=8,
    )
    key = jax.random.PRNGKey(11)

    def render(s):
        return renderer.render_image(
            s, camera, key, width=w, height=h, samples_per_pixel=64,
            trace_depth=6, differentiable=False,
        ).color

    def save(color, path):
        img = film.CombinedImage(
            color=color, normal=jnp.zeros_like(color),
            albedo=jnp.zeros_like(color),
        )
        image_mod.write_png(
            path, np.asarray(film.finalize(img, w, h)["color"])
        )

    target = render(scene)
    save(target, f"{outdir}/cornell_geo_target.png")

    true_pos = scene.boxes.pos
    true_rot = scene.boxes.rot
    # pose perturbation: slide the boxes and twist them about +y
    d_twist = jnp.stack([
        axis_angle_quat((0, 1, 0), 12.0), axis_angle_quat((0, 1, 0), -9.0)
    ])
    init = {
        "box_positions": true_pos + jnp.asarray(
            [[0.12, 0.0, -0.08], [-0.1, 0.0, 0.09]]
        ),
        "box_rotations": _quat_mul(d_twist, true_rot),
    }

    def project(p):
        return {
            "box_positions": p["box_positions"],
            "box_rotations": math3.quat_normalize(p["box_rotations"]),
        }

    save(
        render(params_mod.apply_params(scene, init)),
        f"{outdir}/cornell_geo_init.png",
    )

    t0 = time.perf_counter()
    final, losses = inverse.optimize(
        scene, camera, target, init, cfg, project=project
    )
    dt = time.perf_counter() - t0
    save(
        render(params_mod.apply_params(scene, final)),
        f"{outdir}/cornell_geo_final.png",
    )

    def quat_angle_deg(qa, qb):
        qa = np.asarray(math3.quat_normalize(qa))
        qb = np.asarray(math3.quat_normalize(qb))
        dots = np.abs(np.sum(qa * qb, axis=-1))
        return np.degrees(2.0 * np.arccos(np.clip(dots, -1.0, 1.0)))

    pe0 = np.abs(np.asarray(init["box_positions"] - true_pos)).max(1)
    pe1 = np.abs(np.asarray(final["box_positions"] - true_pos)).max(1)
    re0 = quat_angle_deg(init["box_rotations"], true_rot)
    re1 = quat_angle_deg(final["box_rotations"], true_rot)
    print(f"steps={cfg.steps} wall={dt:.1f}s ({dt/cfg.steps*1e3:.0f} ms/step)")
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    print("box position err:", np.round(pe0, 3), "->", np.round(pe1, 3))
    print("box rotation err (deg):", np.round(re0, 2), "->", np.round(re1, 2))


def main_camera(
    outdir: str = "gallery",
    *,
    size: int = 96,
    steps: int = 150,
) -> None:
    """Camera-pose recovery through silhouette boundary gradients."""
    import optax

    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.diff import boundary
    from raytracing_in_one_weekend_tpu.render import film, renderer
    from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder
    from raytracing_in_one_weekend_tpu.utils import image as image_mod

    w = h = size
    b = SceneBuilder()
    lam = b.lambert((0.1, 0.2, 0.5))
    red = b.lambert((0.8, 0.2, 0.1))
    gr = b.lambert((0.8, 0.8, 0.0))
    met = b.metal((0.8, 0.6, 0.2), glossiness=1.0)
    b.add_sphere((0.0, 0.0, -1.0), 0.5, lam)
    b.add_sphere((-0.8, 0.1, -1.2), 0.4, red)
    b.add_sphere((0.9, -0.1, -1.1), 0.45, met)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, gr)
    scene = b.build()

    def camera_of(th):
        return camera_mod.make_camera(
            th["origin"], th["look"], jnp.asarray([0.0, 1.0, 0.0]),
            70.0, w / h,
        )

    true = {"origin": jnp.zeros(3), "look": jnp.asarray([0.0, 0.0, -1.0])}

    def save(th, path):
        color = renderer.render_image(
            scene, camera_of(th), jax.random.PRNGKey(0), width=w, height=h,
            samples_per_pixel=64, trace_depth=4, differentiable=False,
        ).color
        img = film.CombinedImage(
            color=color, normal=jnp.zeros_like(color),
            albedo=jnp.zeros_like(color),
        )
        image_mod.write_png(
            path, np.asarray(film.finalize(img, w, h)["color"])
        )

    target = renderer.render_image(
        scene, camera_of(true), jax.random.PRNGKey(0), width=w, height=h,
        samples_per_pixel=64, trace_depth=4, differentiable=False,
    ).color
    save(true, f"{outdir}/camera_target.png")

    def render(th, k):
        return renderer.render_image(
            scene, camera_of(th), k, width=w, height=h,
            samples_per_pixel=8, trace_depth=4,
        ).color

    def image_loss(img):
        return jnp.mean((img - target) ** 2)

    vg = boundary.camera_value_and_grad_with_boundary(
        render, image_loss, scene, camera_of, w, h,
        boundary.BoundaryConfig(
            samples_per_sphere=256, trace_depth=4, probe_spp=4
        ),
    )
    init = {
        "origin": true["origin"] + jnp.asarray([0.15, -0.1, 0.12]),
        "look": true["look"] + jnp.asarray([-0.08, 0.06, 0.0]),
    }
    save(init, f"{outdir}/camera_init.png")
    opt = optax.adam(6e-3)
    state = opt.init(init)

    @jax.jit
    def step(p, s, k):
        loss, g = vg(p, k)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    p = init
    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        p, state, loss = step(p, state, jax.random.PRNGKey(500 + i))
        losses.append(float(loss))
    dt = time.perf_counter() - t0
    save(p, f"{outdir}/camera_final.png")

    def fwd_angle(th):
        f = th["look"] - th["origin"]
        f = f / jnp.linalg.norm(f)
        ft = true["look"] - true["origin"]
        ft = ft / jnp.linalg.norm(ft)
        return float(jnp.degrees(jnp.arccos(jnp.clip(jnp.dot(f, ft), -1, 1))))

    print(f"steps={steps} wall={dt:.1f}s ({dt/steps*1e3:.0f} ms/step)")
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    print(
        "origin err",
        float(jnp.abs(init["origin"] - true["origin"]).max()), "->",
        float(jnp.abs(p["origin"] - true["origin"]).max()),
    )
    print(f"view-dir angle err {fwd_angle(init):.2f} -> {fwd_angle(p):.2f} deg")


def main_texture(
    outdir: str = "gallery",
    *,
    size: int = 96,
    steps: int = 200,
) -> None:
    """Differentiable texture painting on the textured-sphere testbed."""
    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.diff import inverse, params as params_mod
    from raytracing_in_one_weekend_tpu.models import testbeds
    from raytracing_in_one_weekend_tpu.render import film, renderer
    from raytracing_in_one_weekend_tpu.utils import image as image_mod

    w = h = size
    scene, cs = testbeds.textured_sphere()
    camera = camera_mod.make_camera(
        cs.origin, cs.look_at, cs.up, cs.vertical_fov, w / h,
    )
    cfg = inverse.InverseRenderConfig(
        width=w, height=h, samples_per_pixel=8, trace_depth=4,
        learning_rate=2e-2, steps=steps,
    )
    key = jax.random.PRNGKey(9)

    def render(s):
        return renderer.render_image(
            s, camera, key, width=w, height=h, samples_per_pixel=32,
            trace_depth=4, differentiable=False,
        ).color

    def save(color, path):
        img = film.CombinedImage(
            color=color, normal=jnp.zeros_like(color),
            albedo=jnp.zeros_like(color),
        )
        image_mod.write_png(
            path, np.asarray(film.finalize(img, w, h)["color"])
        )

    target = render(scene)
    save(target, f"{outdir}/texture_target.png")

    true_atlas = scene.textures.atlas
    init = {"texture_atlas": jnp.full_like(true_atlas, 0.5)}  # gray canvas
    save(
        render(params_mod.apply_params(scene, init)),
        f"{outdir}/texture_init.png",
    )

    def project(p):
        return {"texture_atlas": jnp.clip(p["texture_atlas"], 0.0, 1.0)}

    t0 = time.perf_counter()
    final, losses = inverse.optimize(
        scene, camera, target, init, cfg, project=project
    )
    dt = time.perf_counter() - t0
    save(
        render(params_mod.apply_params(scene, final)),
        f"{outdir}/texture_final.png",
    )

    # error over the texels the view actually constrains (those whose
    # estimate moved off the gray canvas)
    fa = np.asarray(final["texture_atlas"])
    ta = np.asarray(true_atlas)
    seen = np.abs(fa - 0.5).max(axis=-1) > 0.02
    err = np.abs(fa - ta).mean(axis=-1)
    print(f"steps={cfg.steps} wall={dt:.1f}s ({dt/cfg.steps*1e3:.0f} ms/step)")
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    print(
        f"visible texels: {int(seen.sum())}/{seen.size}, "
        f"mean abs err {err[seen].mean():.3f} (init {np.abs(0.5-ta).mean():.3f})"
    )


def main_mesh(outdir: str = "gallery", steps: int = 400) -> None:
    """Mesh sculpting by descent: recover a smooth radial displacement
    field on an icosphere from two rendered views.

    The optimization variable is one displacement scalar per WELDED
    vertex (sculpt-along-normal, the standard parameterization — free
    (V, 3) positions have a tangential null space the photometric loss
    cannot see, measured as an Adam random walk); each step derives the
    triangle soup (T, 3, 3) AND the area-weighted per-vertex shading
    normals from it (params_of is one jax.vjp pullback, so the weld
    constraint and the normal recomputation are chain rules — descent
    cannot crack the surface, and the shading responds to the
    deformation through the barycentric normal lerp in the diff-fused
    replay).  Silhouette terms come from
    diff/boundary.triangle_edge_gradients over the welded adjacency; a
    mild graph-Laplacian smoother damps MC wrinkles; two views keep the
    far hemisphere constrained.  Writes mesh_{target,init,final}.png.
    """
    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.diff import boundary
    from raytracing_in_one_weekend_tpu.diff import params as params_mod
    from raytracing_in_one_weekend_tpu.models import meshes
    from raytracing_in_one_weekend_tpu.render import film, renderer
    from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder
    from raytracing_in_one_weekend_tpu.utils import image as image_mod

    import optax

    w = h = 160
    v, f, n, _ = meshes.icosphere(2)
    v = np.asarray(v, np.float32)
    f = np.asarray(f, np.int32)

    # area-weighted vertex normals as a differentiable function of the
    # unique vertices — recomputed every step (and baked into the
    # target), so the SHADING responds to the deformation.  With frozen
    # shading normals the photometric loss sees a deformation only
    # through silhouettes, which under-determines 162 vertices: measured
    # runs matched both views' outlines while the interior geometry
    # stayed wrong.
    f_j = jnp.asarray(f)
    f_flat_orig = jnp.asarray(f.reshape(-1), jnp.int32)

    def vertex_normals(uniq):
        fv = uniq[f_j]  # (T, 3, 3) face order
        nf = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
        vn = jnp.zeros_like(uniq).at[f_flat_orig].add(
            jnp.repeat(nf, 3, axis=0)
        )
        return vn / jnp.maximum(
            jnp.linalg.norm(vn, axis=1, keepdims=True), 1e-12
        )

    # fix the winding sign once against the known outward unit sphere
    _vn0 = np.asarray(vertex_normals(jnp.asarray(v)))
    n_sign = 1.0 if float((_vn0 * v).sum()) > 0.0 else -1.0

    def build(verts_unique):
        b = SceneBuilder()
        b.add_sphere((0.0, -1000.0, 0.0), 1000.0,
                     b.lambert((0.5, 0.5, 0.5)))
        vn = n_sign * np.asarray(
            vertex_normals(jnp.asarray(verts_unique, jnp.float32))
        )
        b.add_mesh(np.asarray(verts_unique, np.float32), f,
                   b.lambert((0.75, 0.35, 0.2)), normals=vn,
                   translation=(0.0, 1.0, 0.0))
        b.set_gradient_sky()
        return b.build()

    # target: a smooth radial bump field (positions move; shading
    # normals follow as a function of the positions)
    d = v / np.linalg.norm(v, axis=1, keepdims=True)
    bump = 1.0 + 0.18 * np.sin(3.0 * d[:, 0]) * np.cos(2.5 * d[:, 1])
    v_true = (v * bump[:, None]).astype(np.float32)

    scene = build(v)  # template: topology from the unit sphere
    # Two views: a single view leaves the far hemisphere photometrically
    # unconstrained, and Adam normalizes its pure-noise gradients up to
    # full-size steps — unseen vertices random-walked ~0.2 units over
    # 200 steps.  Front + back cameras constrain (almost) every vertex.
    cameras = [
        camera_mod.make_camera(
            jnp.asarray([0.0, 1.4, 3.2]), jnp.asarray([0.0, 1.0, 0.0]),
            jnp.asarray([0.0, 1.0, 0.0]), 42.0, 1.0,
        ),
        camera_mod.make_camera(
            jnp.asarray([0.9, 1.7, -3.0]), jnp.asarray([0.0, 1.0, 0.0]),
            jnp.asarray([0.0, 1.0, 0.0]), 42.0, 1.0,
        ),
    ]
    key = jax.random.PRNGKey(11)

    def render(s, cam=None):
        return renderer.render_image(
            s, cam or cameras[0], key, width=w, height=h,
            samples_per_pixel=64, trace_depth=4, differentiable=False,
        ).color

    def save(color, path):
        img = film.CombinedImage(
            color=color, normal=jnp.zeros_like(color),
            albedo=jnp.zeros_like(color),
        )
        image_mod.write_png(
            path, np.asarray(film.finalize(img, w, h)["color"])
        )

    true_scene = build(v_true)
    targets = [render(true_scene, c) for c in cameras]
    save(targets[0], f"{outdir}/mesh_target.png")
    save(render(scene), f"{outdir}/mesh_init.png")

    # soup slot -> unique vertex scatter map.  add_mesh keeps the
    # (v0, v1, v2) slot order but SceneBuilder.build() Morton-sorts soup
    # ROWS by centroid — recover the row permutation by matching
    # quantized vertex keys so gradients scatter to the right vertices
    # (the first cut skipped this and descent diverged: every soup
    # gradient landed on an unrelated unique vertex).
    from raytracing_in_one_weekend_tpu.scene import scene as scene_mod

    off_np = np.asarray([0.0, 1.0, 0.0], np.float32)
    orig_soup = (v + off_np)[f]  # (T, 3, 3) in face order
    built_soup = np.asarray(scene_mod.soup_vertices(scene))
    span = float(max(built_soup.max() - built_soup.min(), 1e-6))

    def _key(tri):
        return np.round(tri / span * 1e5).astype(np.int64).tobytes()

    built_row = {_key(built_soup[t]): t for t in range(built_soup.shape[0])}
    faces_built = np.empty_like(f)
    for i in range(f.shape[0]):
        faces_built[built_row[_key(orig_soup[i])]] = f[i]
    faces_flat = jnp.asarray(faces_built.reshape(-1), jnp.int32)  # (T*3,)

    adjacency = boundary.build_triangle_adjacency(scene)

    def make_vg(cam, target):
        return boundary.value_and_grad_with_boundary(
            lambda p, k: renderer.render_image(
                params_mod.apply_params(scene, p), cam, k,
                width=w, height=h, samples_per_pixel=8, trace_depth=4,
            ).color,
            lambda img: jnp.mean((img - target) ** 2),
            lambda p: params_mod.apply_params(scene, p),
            cam, w, h,
            boundary.BoundaryConfig(
                samples_per_edge=8, trace_depth=4, probe_spp=4
            ),
            triangle_adjacency=adjacency,
        )

    vgs = [make_vg(c, t) for c, t in zip(cameras, targets)]

    # uniform-Laplacian smoothness on the welded graph: keeps the noisy
    # MC gradients from wrinkling the surface (standard mesh-sculpting
    # regularizer; the true deformation is smooth, so it costs nothing)
    nbrs = [set() for _ in range(v.shape[0])]
    for tri in f:
        for a, b2 in ((0, 1), (1, 2), (2, 0)):
            nbrs[tri[a]].add(int(tri[b2]))
            nbrs[tri[b2]].add(int(tri[a]))
    max_deg = max(len(s) for s in nbrs)
    nbr_idx = np.zeros((v.shape[0], max_deg), np.int32)
    nbr_msk = np.zeros((v.shape[0], max_deg), np.float32)
    for i, s in enumerate(nbrs):
        for j, q in enumerate(sorted(s)):
            nbr_idx[i, j] = q
            nbr_msk[i, j] = 1.0
    nbr_idx = jnp.asarray(nbr_idx)
    nbr_msk = jnp.asarray(nbr_msk)
    deg = jnp.sum(nbr_msk, axis=1, keepdims=True)

    def laplacian_t(t):
        return jnp.sum(t[nbr_idx] * nbr_msk, axis=1) / deg[:, 0] - t

    # the mesh was baked with translation (0, 1, 0): optimize in world
    # space and compare against the translated truth
    off = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    vw_init = jnp.asarray(v) + off
    vw_true = jnp.asarray(v_true) + off

    # Sculpt along the RADIAL direction: one displacement scalar per
    # welded vertex, uniq(t) = off + dir * (1 + t).  Free per-vertex
    # (V, 3) positions were measured to drift: the photometric loss only
    # sees the SURFACE, so tangential vertex motion is a near-null space
    # — the full-3D gradient was only cos = 0.19 aligned with the truth
    # direction (consistently across seeds) and Adam's per-coordinate
    # normalization walked the null components far from the truth while
    # the image still matched.  Displacement-along-normal is the
    # standard sculpting parameterization and removes that null space.
    dirs = jnp.asarray(d, jnp.float32)

    def uniq_of(t):
        return off + dirs * (1.0 + t)[:, None]

    # faces_built maps built soup rows -> unique ids; normals live as
    # vertex COLUMNS (Triangles.normals layout)
    faces_built_j = jnp.asarray(faces_built, jnp.int32)

    def params_of(t):
        uniq = uniq_of(t)
        soup = uniq[faces_flat].reshape(-1, 3, 3)
        nrm = n_sign * vertex_normals(uniq)
        nrm_soup = jnp.transpose(nrm[faces_built_j], (0, 2, 1))
        return {"triangle_vertices": soup, "triangle_normals": nrm_soup}

    lam = 0.02  # mild smoothness on the displacement FIELD (truth is
    # smooth; this damps MC wrinkles without a pin-to-init bias)

    opt = optax.adam(
        optax.cosine_decay_schedule(8e-3, steps, alpha=0.1)
    )

    @jax.jit
    def step(t, opt_state, k):
        p, pullback = jax.vjp(params_of, t)
        k1, k2 = jax.random.split(k)
        loss = 0.0
        g_p = jax.tree.map(jnp.zeros_like, p)
        for vg, kk in zip(vgs, (k1, k2)):
            li, g = vg(p, kk)
            loss = loss + li
            g_p = jax.tree.map(jnp.add, g_p, g)
        (g_t,) = pullback(g_p)
        g_t = g_t + lam * jax.grad(
            lambda tt: jnp.sum(laplacian_t(tt) ** 2)
        )(t)
        up, opt_state = opt.update(g_t, opt_state, t)
        return optax.apply_updates(t, up), opt_state, loss

    t_par = jnp.zeros((v.shape[0],), jnp.float32)
    t_true = jnp.asarray(bump - 1.0, jnp.float32)
    opt_state = opt.init(t_par)
    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        t_par, opt_state, loss = step(t_par, opt_state,
                                      jax.random.PRNGKey(1000 + i))
        losses.append(float(loss))
        if i % 25 == 0:
            print(f"step {i}: loss {losses[-1]:.5f}", flush=True)
    dt = time.perf_counter() - t0

    final_scene = params_mod.apply_params(scene, params_of(t_par))
    save(render(final_scene), f"{outdir}/mesh_final.png")
    e0 = np.abs(np.asarray(t_true))
    e1 = np.abs(np.asarray(t_par - t_true))
    print(f"steps={steps} wall={dt:.1f}s ({dt/steps*1e3:.0f} ms/step)")
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    print(f"mean radial displacement err {e0.mean():.4f} -> "
          f"{e1.mean():.4f}; max {e0.max():.4f} -> {e1.max():.4f}")
    seen = d[:, 1] > -0.3  # the ground-facing cap is outside both views
    print(f"  seen vertices ({int(seen.sum())}): "
          f"{e0[seen].mean():.4f} -> {e1[seen].mean():.4f}; "
          f"hidden cap ({int((~seen).sum())}): "
          f"{e0[~seen].mean():.4f} -> {e1[~seen].mean():.4f}")


def main_motion(outdir: str = "gallery", steps: int = 120) -> None:
    """Recover a sphere's motion-blur offset FROM its own blur (the
    time-augmented silhouette term, diff/boundary.edge_gradients d_move;
    reference motion model Entity.cs:124-127 TransformAtTime).  Round 3
    measured interior-only descent diverging (cos 0.24) — the loss
    signal lives in the swept silhouette."""
    import optax

    from raytracing_in_one_weekend_tpu.core import camera as camera_mod
    from raytracing_in_one_weekend_tpu.diff import boundary, params as params_mod
    from raytracing_in_one_weekend_tpu.render import film, renderer
    from raytracing_in_one_weekend_tpu.scene.scene import SceneBuilder
    from raytracing_in_one_weekend_tpu.utils import image as image_mod

    w = h = 128
    spp, depth = 48, 5
    b = SceneBuilder()
    lam = b.lambert((0.8, 0.2, 0.2))
    ground = b.lambert((0.5, 0.5, 0.5))
    b.add_sphere((-0.3, 0.0, -1.2), 0.35, lam, move_offset=(0.0, 0.0, 0.0))
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    b.set_gradient_sky()
    scene = b.build()
    camera = camera_mod.make_camera(
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]),
        jnp.asarray([0.0, 1.0, 0.0]), 90.0, w / h,
    )
    true_move = jnp.asarray([[0.6, 0.1, 0.25], [0.0, 0.0, 0.0]])

    def save(color, path):
        img = film.CombinedImage(
            color=color, normal=jnp.zeros_like(color),
            albedo=jnp.zeros_like(color),
        )
        image_mod.write_png(
            path, np.asarray(film.finalize(img, w, h)["color"])
        )

    target = renderer.render_image(
        params_mod.set_sphere_move_offsets(scene, true_move), camera,
        jax.random.PRNGKey(3), width=w, height=h,
        samples_per_pixel=128, trace_depth=depth, differentiable=False,
    ).color
    save(target, f"{outdir}/motion_target.png")

    @jax.jit
    def render(p, k):
        sc = params_mod.apply_params(scene, p)
        return renderer.render_image(
            sc, camera, k, width=w, height=h,
            samples_per_pixel=spp, trace_depth=depth,
        ).color

    def image_loss(img):
        return jnp.mean((img - target) ** 2)

    vg = jax.jit(
        boundary.value_and_grad_with_boundary(
            render, image_loss,
            lambda p: params_mod.apply_params(scene, p),
            camera, w, h,
            boundary.BoundaryConfig(
                samples_per_sphere=256, trace_depth=depth, probe_spp=4
            ),
        )
    )
    params = {"sphere_move_offsets": jnp.zeros((2, 3), jnp.float32)}
    save(render(params, jax.random.PRNGKey(0)),
         f"{outdir}/motion_init.png")
    opt = optax.adam(0.04)
    state = opt.init(params)
    key = jax.random.PRNGKey(17)
    t0 = time.perf_counter()
    losses = []
    for i in range(steps):
        key, k = jax.random.split(key)
        loss, grads = vg(params, k)
        losses.append(float(loss))
        updates, state = opt.update(grads, state)
        params = optax.apply_updates(params, updates)
    dt = time.perf_counter() - t0
    save(render(params, jax.random.PRNGKey(1)),
         f"{outdir}/motion_final.png")
    got = np.asarray(params["sphere_move_offsets"][0])
    want = np.asarray(true_move[0])
    cos = float(got @ want / (np.linalg.norm(got) * np.linalg.norm(want)
                              + 1e-12))
    print(f"steps={steps} wall={dt:.1f}s ({dt/steps*1e3:.0f} ms/step)")
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    print(f"move {np.round(got, 3)} vs true {np.round(want, 3)} "
          f"(cos {cos:.3f}, |err| {np.linalg.norm(got - want):.3f})")


def _quat_mul(a, b):
    """Hamilton product of (…,4) quats in (x,y,z,w) layout: rotation b
    followed by a."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


if __name__ == "__main__":
    _out = sys.argv[1] if len(sys.argv) > 1 else "gallery"
    _mode = sys.argv[2] if len(sys.argv) > 2 else ""
    if _mode == "cornell":
        main_cornell(_out)
    elif _mode == "cornell-geometry":
        main_cornell_geometry(_out)
    elif _mode == "camera":
        main_camera(_out)
    elif _mode == "texture":
        main_texture(_out)
    elif _mode == "mesh":
        main_mesh(_out)
    elif _mode == "motion":
        main_motion(_out)
    else:
        main(_out)

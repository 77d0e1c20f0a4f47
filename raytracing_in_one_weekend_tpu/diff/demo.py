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
    else:
        main(_out)

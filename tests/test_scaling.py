"""Scaling harness + animation CLI tests (virtual 8-device CPU mesh)."""

import os

import numpy as np
import pytest

from raytracing_in_one_weekend_tpu.parallel import scaling


class TestScalingHarness:
    def test_measures_all_mesh_sizes(self):
        report = scaling.measure(
            device_counts=(1, 2, 4), width=32, height=32,
            samples=2, trace_depth=3, batches=2,
        )
        assert set(report["rays_per_sec"]) == {"1", "2", "4"}
        assert report["efficiency"]["1"] == pytest.approx(1.0)
        for v in report["rays_per_sec"].values():
            assert v > 0


class TestAnimationCli:
    def test_orbit_frames(self, tmp_path):
        from raytracing_in_one_weekend_tpu.__main__ import main

        out = str(tmp_path / "anim.png")
        rc = main([
            "--scene", "single_sphere", "--width", "16", "--height", "16",
            "--spp", "1", "--depth", "3", "--batch-range", "1", "1",
            "--no-adaptive", "--frames", "3", "--orbit-degrees", "90",
            "--output", out, "--quiet",
        ])
        assert rc == 0
        frames = [
            np.asarray(os.path.getsize(str(tmp_path / f"anim_{i:04d}.png")))
            for i in range(3)
        ]
        assert all(f > 100 for f in frames)

"""Reference-compatible YAML configuration loader.

Accepts the exact key set the reference parses with cv::FileStorage
(src/Tracking.cc:53-147, src/Viewer.cc:33-51): ``Camera.*``,
``ORBextractor.*``, ``ThDepth``, ``DepthMapFactor`` — so the stock
Examples/*/[TUM1|KITTI00-02|EuRoC].yaml files port verbatim (modulo the
%YAML directive OpenCV requires, which is stripped here).
"""

from __future__ import annotations

import dataclasses

import yaml

from ..models.frontend import FrontendConfig


def load_settings(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    # strip OpenCV's "%YAML:1.0" directive which PyYAML rejects
    lines = [l for l in text.splitlines() if not l.startswith("%YAML")]
    return yaml.safe_load("\n".join(lines)) or {}


def frontend_config_from_settings(
    settings: dict, height: int, width: int
) -> FrontendConfig:
    g = settings.get
    return FrontendConfig(
        height=height,
        width=width,
        n_features=int(g("ORBextractor.nFeatures", 1000)),
        n_levels=int(g("ORBextractor.nLevels", 8)),
        scale_factor=float(g("ORBextractor.scaleFactor", 1.2)),
        th_fast=float(g("ORBextractor.iniThFAST", 20)),
        th_fast_min=float(g("ORBextractor.minThFAST", 7)),
        fx=float(g("Camera.fx", 500.0)),
        fy=float(g("Camera.fy", 500.0)),
        cx=float(g("Camera.cx", width / 2)),
        cy=float(g("Camera.cy", height / 2)),
        k1=float(g("Camera.k1", 0.0)),
        k2=float(g("Camera.k2", 0.0)),
        p1=float(g("Camera.p1", 0.0)),
        p2=float(g("Camera.p2", 0.0)),
        k3=float(g("Camera.k3", 0.0)),
        bf=float(g("Camera.bf", 0.0)),
        depth_th=float(g("ThDepth", 40.0)),
    )


def camera_fps(settings: dict) -> float:
    return float(settings.get("Camera.fps", 30.0))


def depth_map_factor(settings: dict) -> float:
    f = float(settings.get("DepthMapFactor", 1.0))
    return 1.0 / f if abs(f) > 1e-5 else 1.0

"""Headless viewer — the Viewer thread (src/Viewer.cc) without a GUI.

Where the reference spawns a Pangolin render thread with menu toggles,
HeadlessViewer is a host-side sink: call update() per tracked frame and
it writes frame-overlay and map-view PNGs to out_dir at a configurable
stride, and finalize() renders the full final map (with objects,
semi-dense cloud and 3D lines when available). Deterministic, CI-safe,
zero GUI deps.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from eao_slam_tpu.viz.frame_drawer import draw_frame
from eao_slam_tpu.viz.map_drawer import MapRenderOptions, render_map
from eao_slam_tpu.viz.raster import save_png


@dataclass
class ViewerOptions:
    every: int = 10                 # render stride (frames)
    follow: bool = True             # menuFollowCamera
    render: MapRenderOptions = field(default_factory=MapRenderOptions)


class HeadlessViewer:
    def __init__(self, out_dir: str, options: ViewerOptions | None = None):
        self.out = out_dir
        self.opt = options or ViewerOptions()
        os.makedirs(out_dir, exist_ok=True)
        self.n = 0
        self.written: list = []

    # ------------------------------------------------------------------

    def update(self, tracker, frame=None, img=None, T_cw=None,
               n_tracked=None) -> None:
        """Per-frame hook (FrameDrawer::Update + map snapshot)."""
        i = self.n
        self.n += 1
        if i % self.opt.every:
            return
        if img is not None and frame is not None:
            ov = draw_frame(img, frame, state=tracker.state,
                            n_tracked=n_tracked)
            self.written.append(
                save_png(os.path.join(self.out, f"frame_{i:06d}.png"), ov))
        if getattr(tracker, "map", None) is not None:
            mv = render_map(
                tracker.map,
                objects=getattr(tracker, "obj_table", None),
                cur_T_cw=T_cw if (T_cw is not None and self.opt.follow) else None,
                opt=self.opt.render,
            )
            self.written.append(
                save_png(os.path.join(self.out, f"map_{i:06d}.png"), mv))

    # ------------------------------------------------------------------

    def finalize(self, system=None, tracker=None, semidense_pts=None,
                 semidense_sigma=None, lines3d=None) -> str:
        """Render the final full map view (points + graph + objects +
        semi-dense + lines); returns the written path."""
        if system is not None:
            tracker = system.tracker
            if semidense_pts is None:
                res = getattr(system, "_semidense_result", None)
                if res is not None and hasattr(system, "semidense_world_points"):
                    try:
                        semidense_pts, semidense_sigma = \
                            system.semidense_world_points()
                    except Exception:
                        pass
            if lines3d is None:
                l3 = getattr(system, "_lines3d", None)
                if l3 is not None:
                    lines3d = np.asarray(l3[0]) if isinstance(l3, tuple) else l3
        from eao_slam_tpu.runtime.map_state import covisibility_counts

        covis = None
        if tracker is not None and getattr(tracker, "map", None) is not None:
            covis = np.asarray(covisibility_counts(tracker.map))
        path = os.path.join(self.out, "map_final.png")
        mv = render_map(
            tracker.map if tracker is not None else None,
            objects=getattr(tracker, "obj_table", None),
            covis=covis,
            semidense_pts=semidense_pts, semidense_sigma=semidense_sigma,
            lines3d=lines3d, opt=self.opt.render,
        )
        save_png(path, mv)
        self.written.append(path)
        return path

"""Self-contained web viewer: live renders over HTTP with orbit controls.

Capability equivalent of the reference's viser/splatview viewer
(/root/reference/splat_trainer/viewer/splatview.py:33-289) without its
external dependencies (not available here): a stdlib http server renders
frames on demand from browser camera poses, exposes pause/resume, depth
view, specular weight, and training stats — the GUI features the reference
exposes (:83-126) as a small embedded JS client.
"""

import json
import threading
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from splat_trainer_tpu.viewer.viewer import Viewer, ViewerConfig

_PAGE = """<!DOCTYPE html>
<html><head><title>splat-trainer-tpu</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:8px}
img{width:100vw;height:100vh;object-fit:contain;display:block}
</style></head><body>
<div id="hud">
  <div id="stats">connecting…</div>
  <label><input type="checkbox" id="depth"> depth</label>
  <label><input type="checkbox" id="pause"> pause training</label>
  <label><input type="checkbox" id="aa"> antialias</label>
  <label>blur_cov <input type="number" id="blur" min="0" max="2" step="0.1" value="0.3" style="width:4em"></label>
  <label>specular <input type="range" id="spec" min="0" max="2" step="0.1" value="1"></label><br>
  <label>camera <input type="number" id="cam" min="-1" value="-1" style="width:4em"> (-1 = orbit)</label>
  <label>zoom <input type="range" id="zoom" min="0.2" max="5" step="0.1" value="1"></label><br>
  <label>crop quantile <input type="range" id="quant" min="0.05" max="1" step="0.05" value="0.25"></label>
  <button onclick="fetch('/crop?quantile='+document.getElementById('quant').value)">crop fg</button>
  <button onclick="fetch('/restore')">restore</button>
</div>
<img id="view">
<script>
let az=0.5, el=0.3, radius=4, drag=null;
const img=document.getElementById('view');
img.ondragstart=()=>false;
document.onmousedown=e=>{drag=[e.clientX,e.clientY]};
document.onmouseup=()=>{drag=null};
document.onmousemove=e=>{ if(!drag) return;
  az+=(e.clientX-drag[0])*0.01; el+=(e.clientY-drag[1])*0.01;
  el=Math.max(-1.5,Math.min(1.5,el)); drag=[e.clientX,e.clientY]; };
document.onwheel=e=>{radius*=Math.exp(e.deltaY*0.001)};
document.getElementById('pause').onchange=e=>fetch('/pause?on='+(e.target.checked?1:0));
document.getElementById('aa').onchange=e=>fetch('/config?antialias='+(e.target.checked?1:0));
document.getElementById('blur').onchange=e=>fetch('/config?blur_cov='+e.target.value);
async function loop(){
  const depth=document.getElementById('depth').checked?1:0;
  const spec=document.getElementById('spec').value;
  const cam=document.getElementById('cam').value;
  const zoom=document.getElementById('zoom').value;
  img.src=`/render?az=${az}&el=${el}&r=${radius}&depth=${depth}&spec=${spec}&cam=${cam}&zoom=${zoom}&t=${Date.now()}`;
  const s=await (await fetch('/stats')).json();
  document.getElementById('stats').textContent=JSON.stringify(s);
  setTimeout(loop, 100);
}
loop();
</script></body></html>"""


@dataclass(frozen=True)
class WebViewerConfig(ViewerConfig):
    port: int = 8080
    image_size: tuple = (960, 640)

    def create_viewer(self, trainer) -> "WebViewer":
        return WebViewer(self, trainer)


class WebViewer(Viewer):
    def __init__(self, config: WebViewerConfig, trainer):
        self.config = config
        self.trainer = trainer
        self._lock = threading.Lock()
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, content, ctype):
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(content)))
                self.end_headers()
                self.wfile.write(content)

            def do_GET(self):
                url = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                try:
                    if url.path == "/":
                        self._send(_PAGE.encode(), "text/html")
                    elif url.path == "/render":
                        self._send(viewer.render_jpeg(q), "image/jpeg")
                    elif url.path == "/stats":
                        self._send(json.dumps(viewer.stats()).encode(),
                                   "application/json")
                    elif url.path == "/pause":
                        viewer.trainer.set_paused(q.get("on") == "1")
                        self._send(b"ok", "text/plain")
                    elif url.path == "/config":
                        # live renderer mutation (reference splatview.py:
                        # 170-187); update_config invalidates the compiled
                        # render/eval/step programs that baked the old
                        # RasterConfig
                        changes = {}
                        if "antialias" in q:
                            changes["antialias"] = q["antialias"] == "1"
                        if "blur_cov" in q:
                            changes["blur_cov"] = float(q["blur_cov"])
                        if changes:
                            viewer.trainer.update_config(**changes)
                        self._send(b"ok", "text/plain")
                    elif url.path == "/crop":
                        viewer.crop_foreground(float(q.get("quantile", 0.25)))
                        self._send(b"ok", "text/plain")
                    elif url.path == "/restore":
                        viewer.restore_scene()
                        self._send(b"ok", "text/plain")
                    else:
                        self.send_error(404)
                except Exception as e:  # never kill the server
                    self.send_error(500, str(e))

        self.server = ThreadingHTTPServer(("0.0.0.0", config.port), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()
        print(f"viewer: http://localhost:{config.port}")

    def _camera(self, az: float, el: float, radius: float):
        import jax.numpy as jnp
        from splat_trainer_tpu.cameras.camera_table import camera_scene_extents
        from splat_trainer_tpu.core.types import CameraParams

        centroid, extent = camera_scene_extents(
            self.trainer.camera_table.cameras)
        centroid = np.asarray(centroid)
        r = radius * float(extent) / 4.0 + 1e-3
        eye = centroid + r * np.array([
            np.cos(az) * np.cos(el), np.sin(el), np.sin(az) * np.cos(el)])
        fwd = (centroid - eye)
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= max(np.linalg.norm(right), 1e-9)
        up = np.cross(fwd, right)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.stack([right, up, fwd], axis=1).T
        T[:3, 3] = -T[:3, :3] @ eye.astype(np.float32)
        w, h = self.config.image_size
        fx = 0.5 * w / np.tan(np.radians(30.0))
        return CameraParams.create(T, [fx, fx, w / 2, h / 2],
                                   self.config.image_size)

    def _training_camera(self, idx: int, zoom: float):
        """Render from a dataset camera (reference camera select +
        zoom modifiers, splatview.py:92-126) at the viewer resolution."""
        table = self.trainer.camera_table
        idx = max(0, min(idx, table.num_images - 1))
        cam = table.camera_params(idx)
        w0, h0 = table.image_size
        w, h = self.config.image_size
        sx, sy = w / w0, h / h0
        proj = np.asarray(cam.projection) * np.array(
            [sx * zoom, sy * zoom, sx, sy], np.float32)
        return cam.replace(projection=proj, image_size=self.config.image_size), idx

    def render_jpeg(self, q) -> bytes:
        import cv2

        cam_idx = int(float(q.get("cam", -1)))
        image_idx = None
        if cam_idx >= 0:
            camera, image_idx = self._training_camera(
                cam_idx, float(q.get("zoom", 1.0)))
        else:
            camera = self._camera(float(q.get("az", 0)),
                                  float(q.get("el", 0.3)),
                                  float(q.get("r", 4)))
        with self._lock:
            rendering = self.trainer.render(
                camera, image_idx=image_idx, render_median_depth=True,
                specular_weight=float(q.get("spec", 1.0)))
        if q.get("depth") == "1":
            from splat_trainer_tpu.utils.colorize import colorize
            img = colorize(np.asarray(rendering.median_ndc_image))
        else:
            img = (np.clip(np.asarray(rendering.image), 0, 1) * 255
                   ).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        return buf.tobytes()

    def crop_foreground(self, quantile: float = 0.25):
        """Deactivate background points (reference crop button,
        splatview.py:178-187 — theirs clones the scene; capacity slots make
        a reversible active-mask crop the natural equivalent)."""
        import jax.numpy as jnp

        from splat_trainer_tpu.visibility.query_points import foreground_mask

        with self._lock:
            if getattr(self, "_saved_active", None) is None:
                self._saved_active = self.trainer.scene.active
            mask = foreground_mask(self.trainer.camera_table.cameras,
                                   self.trainer.scene.points["position"],
                                   quantile=quantile,
                                   active=self._saved_active)
            self.trainer.scene = self.trainer.scene.replace(
                active=self._saved_active & jnp.asarray(mask))

    def restore_scene(self):
        with self._lock:
            if getattr(self, "_saved_active", None) is not None:
                self.trainer.scene = self.trainer.scene.replace(
                    active=self._saved_active)
                self._saved_active = None

    def stats(self) -> dict:
        t = self.trainer
        out = {"step": t.step, "points": int(t.scene.active.sum())}
        if "train/metrics" in t.logger:
            m = t.logger["train/metrics"]
            out.update({k: round(v.value, 4) for k, v in m.items()})
        return out

    def spin(self):
        print("viewer serving — ctrl-c to exit")
        try:
            self.thread.join()
        except KeyboardInterrupt:
            pass

    def close(self):
        self.server.shutdown()

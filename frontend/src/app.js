// App wiring: state, upload, model cards, settings, job lifecycle, and
// the 3D data-source priority chain. First-party equivalent of the
// reference React component (reference frontend/src/App.jsx):
//  - upload handler with 50 MB client check + state reset (App.jsx:899-941)
//  - model cards from GET /models (App.jsx:92-121, 1375-1419)
//  - pipeline-steps UI with progress→step mapping (App.jsx:65-90, 987-989)
//  - data-source priority chain: backend preview → client-side depth-PNG
//    regen → refetch /status → demo content (App.jsx:805-897)
//  - downloads, stats panel, settings modal, demo mode.

import {
  API_BASE, downloadGisJson, downloadPointCloud,
  fetchHealth, fetchModels, fetchStatus, pollJob, submitJob,
} from "./api.js";
import { demoMesh, demoPointCloud, demoResults } from "./demo.js";
import { cloudFromDepthMap } from "./depthdecode.js";
import { DepthView } from "./depthview.js";
import { Viewer } from "./viewer.js";

const $ = (id) => document.getElementById(id);

// ---------- state (App.jsx:18-27 defaults; depthScale 15 — quirk 6 of
// PARITY.md: the FE default differs from the backend's 10.0 on purpose) --
const state = {
  file: null,
  fileUrl: null,
  settings: {
    model: "depth-anything-v2",
    outputFormat: "las",
    pointDensity: "medium",
    coordinateSystem: "WGS84",
    invertDepth: true,
    depthScale: 15,
    smoothDepth: false,
    fov: 60,
    pointSize: 2,
  },
  jobId: null,
  results: null,
  busy: false,
};

// ---------- viewer ----------
// WebGL2 may be unavailable (policy-disabled, old Safari); the 3D pane
// degrades to a placeholder while upload/depth-map/downloads keep
// working — a throw here would kill every event binding below.
function makeViewer() {
  try {
    return new Viewer($("gl-canvas"), {
      onDebug: (txt) => { $("viewer-debug").textContent = txt; },
    });
  } catch (e) {
    console.warn("3D viewer unavailable:", e);
    $("viewer-debug").textContent = "3D viewer unavailable (WebGL2 required)";
    const noop = () => {};
    return {
      options: { autoRotate: false, showGrid: true, showAxes: true,
                 wireframe: false, pointSize: 2 },
      setMesh: noop, setPointCloud: noop, clearScene: noop,
      resetCamera: noop, zoomToExtent: noop,
    };
  }
}
const viewer = makeViewer();

const depthView = new DepthView($("depth-view"), $("depth-img"), $("depth-pos"));
const depthViewFull = new DepthView(
  $("depth-view-full"), $("depth-img-full"), $("depth-pos-full"),
);

// ---------- helpers ----------

function clearSteps() {
  for (const li of $("pipeline-steps").children) {
    li.classList.remove("active", "done");
  }
}

function setStep(which, cls) {
  clearSteps();
  const order = ["upload", "ai", "cloud"];
  const idx = order.indexOf(which);
  order.forEach((name, i) => {
    const li = document.querySelector(`[data-step="${name}"]`);
    if (i < idx) li.classList.add("done");
    else if (i === idx) li.classList.add(cls || "active");
  });
}

function setProgress(pct, msg) {
  $("progress-bar").style.width = `${pct}%`;
  $("progress-msg").textContent = msg || "";
  // progress→step mapping (App.jsx:987-989): 1–40 upload, 40–80 AI,
  // 80–100 cloud. pct 0 (reset / error) clears the highlights — stale
  // "done" classes from the previous run must not survive a new upload.
  if (pct >= 100) setStep("cloud", "done");
  else if (pct >= 80) setStep("cloud");
  else if (pct >= 40) setStep("ai");
  else if (pct > 0) setStep("upload");
  else clearSteps();
}

function flatten(nested) {
  const out = new Float32Array(nested.length * 3);
  for (let i = 0; i < nested.length; i++) out.set(nested[i], i * 3);
  return out;
}

function normColors(nested, scale) {
  // Viewer wants 0–1; the backend shape is known per endpoint (preview
  // colors are 0–255 ints, meshPreview colors are 0–1 doubles —
  // serve/app_v1.py results assembly), so callers pass the scale
  // explicitly. A max-based guess would render an all-dark photo's
  // near-black 0–255 colors at full brightness.
  const out = new Float32Array(nested.length * 3);
  for (let i = 0; i < nested.length; i++) {
    out.set(
      [nested[i][0] * scale, nested[i][1] * scale, nested[i][2] * scale],
      i * 3,
    );
  }
  return out;
}

function updateStats(results) {
  const g = results?.gisData;
  $("st-points").textContent = g?.pointCount ?? results?.pointCloud?.points ?? "—";
  $("st-format").textContent = results?.pointCloud?.format ?? "—";
  const b = g?.bounds;
  const f = (lo, hi) =>
    b ? `${Number(lo).toFixed(2)} … ${Number(hi).toFixed(2)}` : "—";
  $("st-bx").textContent = b ? f(b.minX, b.maxX) : "—";
  $("st-by").textContent = b ? f(b.minY, b.maxY) : "—";
  $("st-bz").textContent = b ? f(b.minZ, b.maxZ) : "—";
  $("st-crs").textContent = g?.coordinateSystem ?? "—";
  $("btn-dl-cloud").disabled = !results?.downloadUrl;
  $("btn-dl-gis").disabled = !g;
}

// ---------- data-source priority chain (App.jsx:805-897) ----------

async function display3DData() {
  const r = state.results;
  // P1: backend preview arrays.
  if (r?.meshPreview?.vertices?.length) {
    const mp = r.meshPreview;
    viewer.setMesh({
      positions: flatten(mp.vertices),
      normals: flatten(mp.normals),
      colors: normColors(mp.colors, 1),  // meshPreview: 0–1 doubles
      indices: new Uint32Array(mp.faces),
    });
    return;
  }
  if (r?.preview?.points?.length) {
    viewer.setPointCloud(
      flatten(r.preview.points),
      normColors(r.preview.colors, 1 / 255),  // preview: 0–255 ints
    );
    return;
  }
  // P2: regenerate client-side from the colorized depth PNG.
  if (r?.depthMap && state.fileUrl) {
    try {
      const { positions, colors } = await cloudFromDepthMap(
        r.depthMap, state.fileUrl, state.settings,
      );
      if (positions.length) {
        viewer.setPointCloud(positions, colors);
        return;
      }
    } catch (e) {
      console.warn("client-side depth decode failed", e);
    }
  }
  // P3: refetch from the backend by job id.
  if (state.jobId) {
    try {
      const job = await fetchStatus(state.jobId);
      if (job.results?.preview?.points?.length) {
        state.results = job.results;
        viewer.setPointCloud(
          flatten(job.results.preview.points),
          normColors(job.results.preview.colors, 1 / 255),
        );
        return;
      }
    } catch (e) {
      console.warn("refetch failed", e);
    }
  }
  // P4: demo content.
  const { positions, colors } = demoPointCloud();
  viewer.setPointCloud(positions, colors);
}

// ---------- upload (App.jsx:899-941) ----------

const MAX_FILE_MB = 50;

function handleFile(file) {
  $("upload-error").hidden = true;
  if (state.busy) {
    // A poll for image A is in flight; accepting B now would let A's
    // completion overwrite B's freshly reset UI (mismatched depth map
    // vs upload preview).
    $("upload-error").textContent =
      "A job is still processing — wait for it to finish";
    $("upload-error").hidden = false;
    return;
  }
  if (!file.type.startsWith("image/")) {
    $("upload-error").textContent = "File must be an image";
    $("upload-error").hidden = false;
    return;
  }
  if (file.size > MAX_FILE_MB * 1024 * 1024) {
    $("upload-error").textContent =
      `File is ${(file.size / 1048576).toFixed(1)} MB — max ${MAX_FILE_MB} MB`;
    $("upload-error").hidden = false;
    return;
  }
  if (state.fileUrl) URL.revokeObjectURL(state.fileUrl);
  state.file = file;
  state.fileUrl = URL.createObjectURL(file);
  state.results = null;
  state.jobId = null;
  $("upload-preview").src = state.fileUrl;
  $("upload-preview").hidden = false;
  $("dropzone-hint").hidden = true;
  $("btn-generate").disabled = false;
  setProgress(0, "");
  updateStats(null);
  depthView.setImage(null);
  depthViewFull.setImage(null); // fullscreen modal must not keep A's map after uploading B
  viewer.clearScene();
}

$("dropzone").addEventListener("click", () => $("file-input").click());
$("file-input").addEventListener("change", (e) => {
  if (e.target.files[0]) handleFile(e.target.files[0]);
});
for (const [ev, on] of [["dragover", true], ["dragleave", false]]) {
  $("dropzone").addEventListener(ev, (e) => {
    e.preventDefault();
    $("dropzone").classList.toggle("drag", on);
  });
}
$("dropzone").addEventListener("drop", (e) => {
  e.preventDefault();
  $("dropzone").classList.remove("drag");
  if (e.dataTransfer.files[0]) handleFile(e.dataTransfer.files[0]);
});

// ---------- model cards (App.jsx:92-121) ----------

let modelCardsLive = false; // real /models loaded (vs offline placeholder)

async function loadModelCards() {
  let models = [];
  try {
    models = (await fetchModels()).models || [];
    modelCardsLive = true;
  } catch {
    models = [{
      id: "depth-anything-v2", name: "Depth Anything V2",
      description: "offline — backend unreachable", speed: "—", quality: "—",
    }];
  }
  const holder = $("model-cards");
  holder.innerHTML = "";
  for (const m of models) {
    // textContent, never innerHTML: model fields come from the API
    // origin, which ?api= lets the URL choose — markup here would be
    // reflected XSS.
    const div = document.createElement("div");
    div.className = "model-card" + (m.id === state.settings.model ? " sel" : "");
    const mk = (cls, txt) => {
      const d = document.createElement("div");
      d.className = cls;
      d.textContent = txt;
      div.appendChild(d);
    };
    mk("mc-name", m.name || m.id);
    mk("mc-meta", m.description || "");
    mk("mc-meta", `speed: ${m.speed || "?"} · quality: ${m.quality || "?"}`);
    div.addEventListener("click", () => {
      state.settings.model = m.id;
      for (const el of holder.children) el.classList.remove("sel");
      div.classList.add("sel");
    });
    holder.appendChild(div);
  }
}

// ---------- generate (App.jsx:948-1021) ----------

$("btn-generate").addEventListener("click", async () => {
  if (!state.file || state.busy) return;
  state.busy = true;
  $("btn-generate").disabled = true;
  try {
    setProgress(5, "Uploading…");
    const { job_id } = await submitJob(state.file, state.settings);
    state.jobId = job_id;
    const job = await pollJob(job_id, (j) => setProgress(j.progress, j.message));
    state.results = job.results;
    setProgress(100, job.message || "Processing complete!");
    depthView.setImage(job.results?.depthMap);
    depthViewFull.setImage(job.results?.depthMap);
    updateStats(job.results);
    await display3DData();
  } catch (e) {
    setProgress(0, "");
    $("progress-msg").textContent = `Error: ${e.message}`;
  } finally {
    state.busy = false;
    $("btn-generate").disabled = !state.file;
  }
});

// ---------- demo mode (App.jsx:1164-1229, button 1249-1254) ----------

$("btn-demo").addEventListener("click", async (e) => {
  state.results = demoResults();
  state.jobId = null;
  depthView.setImage(state.results.depthMap);
  depthViewFull.setImage(state.results.depthMap);
  updateStats(state.results);
  setProgress(100, "Demo data loaded (no backend)");
  if (e.shiftKey) {
    // Shift-click exercises the mesh display path (demo mesh).
    viewer.setMesh(demoMesh());
  } else {
    await display3DData();
  }
});

// ---------- downloads ----------

$("btn-dl-cloud").addEventListener("click", () => downloadPointCloud(state.results));
$("btn-dl-gis").addEventListener("click", () => downloadGisJson(state.results));

// ---------- viewer toolbar ----------

function toggleBtn(btn, get, set) {
  btn.addEventListener("click", () => {
    set(!get());
    btn.classList.toggle("btn-on", get());
  });
  btn.classList.toggle("btn-on", get());
}
$("btn-reset-cam").addEventListener("click", () => viewer.resetCamera());
$("btn-zoom-extent").addEventListener("click", () => viewer.zoomToExtent());
toggleBtn($("btn-autorotate"),
  () => viewer.options.autoRotate, (v) => { viewer.options.autoRotate = v; });
toggleBtn($("btn-wireframe"),
  () => viewer.options.wireframe, (v) => { viewer.options.wireframe = v; });
toggleBtn($("btn-grid"),
  () => viewer.options.showGrid, (v) => { viewer.options.showGrid = v; });
toggleBtn($("btn-axes"),
  () => viewer.options.showAxes, (v) => { viewer.options.showAxes = v; });

// ---------- depth view controls ----------

$("btn-depth-reset").addEventListener("click", () => depthView.reset());
$("btn-depth-full").addEventListener("click", () => {
  $("depth-modal").hidden = false;
  depthViewFull.reset();
});
$("btn-depthmodal-reset").addEventListener("click", () => depthViewFull.reset());
$("btn-depthmodal-close").addEventListener("click", () => {
  $("depth-modal").hidden = true;
});

// ---------- settings modal (App.jsx:1906-2040) ----------

$("btn-settings").addEventListener("click", () => {
  $("settings-modal").hidden = false;
});
$("btn-settings-close").addEventListener("click", () => {
  $("settings-modal").hidden = true;
});
for (const el of document.querySelectorAll(".modal-backdrop")) {
  el.addEventListener("click", (e) => { if (e.target === el) el.hidden = true; });
}

function bindSelect(id, key) {
  $(id).value = state.settings[key];
  $(id).addEventListener("change", (e) => { state.settings[key] = e.target.value; });
}
function bindRange(id, key, labelId, apply) {
  $(id).value = state.settings[key];
  $(labelId).textContent = state.settings[key];
  $(id).addEventListener("input", (e) => {
    state.settings[key] = Number(e.target.value);
    $(labelId).textContent = e.target.value;
    apply?.();
  });
}
function bindCheck(id, key) {
  $(id).checked = state.settings[key];
  $(id).addEventListener("change", (e) => { state.settings[key] = e.target.checked; });
}
bindSelect("set-format", "outputFormat");
bindSelect("set-density", "pointDensity");
bindSelect("set-crs", "coordinateSystem");
bindRange("set-depthscale", "depthScale", "set-depthscale-val");
bindRange("set-fov", "fov", "set-fov-val");
bindRange("set-pointsize", "pointSize", "set-pointsize-val",
  () => { viewer.options.pointSize = state.settings.pointSize; });
bindCheck("set-invert", "invertDepth");
bindCheck("set-smooth", "smoothDepth");

// ---------- health ----------

async function refreshHealth() {
  try {
    const h = await fetchHealth();
    $("health-dot").className = "dot dot-ok";
    $("health-text").textContent =
      `backend ok · ${h.models_loaded?.length ?? 0} model(s)` +
      (API_BASE ? ` · ${API_BASE}` : "");
    // The backend may have come up after the initial page load; swap
    // the offline placeholder for the real model list.
    if (!modelCardsLive) loadModelCards();
  } catch {
    $("health-dot").className = "dot dot-bad";
    $("health-text").textContent = "backend unreachable — demo mode available";
  }
}

refreshHealth();
setInterval(refreshHealth, 10000);
loadModelCards();

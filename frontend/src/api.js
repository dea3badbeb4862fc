// Backend API client: job submission, 1.5 s status polling, downloads.
// Matches the reference frontend's wire behavior (reference
// frontend/src/App.jsx:63 API_BASE, 948-1021 processImage/poll,
// 1036-1056 downloads): FormData POST /process with the 8 settings
// fields, then GET /status/{id} until completed|error.

// Same-origin by default when served from the backend's /ui mount;
// override with ?api=http://host:8000 or window.API_BASE.
// ?api= is restricted to same-origin/localhost/private hosts: an
// arbitrary URL would let a crafted LINK point the app at an attacker's
// server, whose /models responses then render in this origin.
function safeApiOverride(raw) {
  if (!raw) return null;
  try {
    const u = new URL(raw, window.location.href);
    if (!/^https?:$/.test(u.protocol)) return null;
    const h = u.hostname;
    const ok =
      h === window.location.hostname ||
      h === "localhost" || h === "127.0.0.1" || h === "[::1]" ||
      /^10\./.test(h) || /^192\.168\./.test(h) ||
      /^172\.(1[6-9]|2\d|3[01])\./.test(h);
    return ok ? u.origin : null;
  } catch {
    return null;
  }
}
const qs = new URLSearchParams(window.location.search);
export const API_BASE =
  safeApiOverride(qs.get("api")) ||
  window.API_BASE ||
  (window.location.pathname.startsWith("/ui")
    ? ""                      // mounted on the backend itself
    : "http://localhost:8000"); // standalone dev server (App.jsx:63)

export const POLL_MS = 1500; // App.jsx:1014

export async function fetchHealth() {
  const r = await fetch(`${API_BASE}/health`);
  if (!r.ok) throw new Error(`health ${r.status}`);
  return r.json();
}

export async function fetchModels() {
  const r = await fetch(`${API_BASE}/models`);
  if (!r.ok) throw new Error(`models ${r.status}`);
  return r.json();
}

/** POST /process with the same field set the reference sends
 *  (App.jsx:953-962). Returns {job_id, status}. */
export async function submitJob(file, settings) {
  const fd = new FormData();
  fd.append("file", file);
  fd.append("model", settings.model);
  fd.append("output_format", settings.outputFormat);
  fd.append("point_density", settings.pointDensity);
  fd.append("coordinate_system", settings.coordinateSystem);
  fd.append("invert_depth", String(settings.invertDepth));
  fd.append("depth_scale", String(settings.depthScale));
  fd.append("smooth_depth", String(settings.smoothDepth));
  fd.append("fov", String(settings.fov));
  const r = await fetch(`${API_BASE}/process`, { method: "POST", body: fd });
  if (!r.ok) {
    let detail = `HTTP ${r.status}`;
    try { detail = (await r.json()).detail || detail; } catch { /* text */ }
    throw new Error(detail);
  }
  return r.json();
}

// Long-poll horizon per status request: the backend holds the request
// until the job's next state change or this many ms (serve/jobs.py
// status_for; capped server-side at 30 s). Against a server that
// ignores wait_ms, pollJob's pacing guard keeps the reference cadence.
const WAIT_MS = 10000;

export async function fetchStatus(jobId, waitMs = 0) {
  const qs = waitMs > 0 ? `?wait_ms=${waitMs}` : "";
  const r = await fetch(`${API_BASE}/status/${jobId}${qs}`);
  if (!r.ok) throw new Error(`status ${r.status}`);
  return r.json();
}

/** Long-poll /status (progress arrives per state change, not per 1.5 s
 *  tick), invoking onProgress each response; resolves with the final
 *  job object (completed) or rejects (error). */
export function pollJob(jobId, onProgress) {
  return new Promise((resolve, reject) => {
    let failures = 0;
    let last = "";
    const tick = async () => {
      let job;
      const t0 = Date.now();
      try {
        job = await fetchStatus(jobId, WAIT_MS);
        failures = 0;
      } catch (e) {
        // One dropped connection must not abandon a job that is still
        // running server-side; give transient hiccups a few ticks.
        failures += 1;
        if (failures >= 4) {
          reject(e);
          return;
        }
        setTimeout(tick, POLL_MS);
        return;
      }
      onProgress?.(job);
      if (job.status === "completed") { resolve(job); return; }
      if (job.status === "error") {
        reject(new Error(job.message || "failed"));
        return;
      }
      // Re-arm immediately after a real transition (the next request
      // long-polls server-side); pace unchanged-state responses so a
      // server that ignores wait_ms still sees <=1 req/POLL_MS.
      const state = `${job.status}|${job.progress}|${job.message}`;
      const advanced = state !== last;
      last = state;
      setTimeout(tick, advanced ? 0 : Math.max(0, POLL_MS - (Date.now() - t0)));
    };
    tick();
  });
}

/** Open the backend download URL (App.jsx downloadFile 'pointcloud'). */
export function downloadPointCloud(results) {
  if (results?.downloadUrl) window.open(API_BASE + results.downloadUrl);
}

/** GIS metadata is serialized client-side to a Blob JSON download
 *  (App.jsx:1045-1055). */
export function downloadGisJson(results) {
  if (!results?.gisData) return;
  const blob = new Blob(
    [JSON.stringify(results.gisData, null, 2)],
    { type: "application/json" },
  );
  const a = document.createElement("a");
  a.href = URL.createObjectURL(blob);
  a.download = "gis_metadata.json";
  a.click();
  // Safari resolves the synthetic-click download asynchronously; a
  // synchronous revoke can cancel it.
  setTimeout(() => URL.revokeObjectURL(a.href), 10000);
}

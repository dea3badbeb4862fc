// Demo-mode content: procedural 3D data and a fabricated results
// payload so the UI is fully explorable without a backend — feature
// parity with the reference's demo generators (reference
// frontend/src/App.jsx:653-757 demo cloud/mesh, 1164-1229 fake
// results behind the "Demo Mode" button).

import { plasmaLUT } from "./depthdecode.js";

/** 80×60 sinusoidal height grid (App.jsx generateDemo3DContent). */
export function demoPointCloud() {
  const W = 80, H = 60;
  const positions = new Float32Array(W * H * 3);
  const colors = new Float32Array(W * H * 3);
  const lut = plasmaLUT();
  let i = 0;
  for (let v = 0; v < H; v++) {
    for (let u = 0; u < W; u++) {
      const x = (u / W - 0.5) * 12;
      const z = (v / H - 0.5) * 9;
      const y = Math.sin(x * 0.9) * Math.cos(z * 1.1) * 1.6 +
                Math.sin(x * 2.3 + z * 1.7) * 0.35;
      positions.set([x, y, z], i);
      const t = Math.max(0, Math.min(255, Math.round(((y + 2) / 4) * 255)));
      colors.set([lut[t * 3] / 255, lut[t * 3 + 1] / 255, lut[t * 3 + 2] / 255], i);
      i += 3;
    }
  }
  return { positions, colors };
}

/** Noisy-sphere demo mesh (App.jsx demo mesh fallback). */
export function demoMesh() {
  const SEG = 48, RINGS = 32, R = 3;
  const positions = [], normals = [], colors = [];
  const lut = plasmaLUT();
  const rnd = mulberry32(7);
  for (let r = 0; r <= RINGS; r++) {
    const phi = (r / RINGS) * Math.PI;
    for (let s = 0; s <= SEG; s++) {
      const th = (s / SEG) * 2 * Math.PI;
      const noise = 1 + (rnd() - 0.5) * 0.12;
      const x = R * noise * Math.sin(phi) * Math.cos(th);
      const y = R * noise * Math.cos(phi);
      const z = R * noise * Math.sin(phi) * Math.sin(th);
      positions.push(x, y, z);
      const n = 1 / Math.hypot(x, y, z);
      normals.push(x * n, y * n, z * n);
      const t = Math.max(0, Math.min(255, Math.round(((y / R) * 0.5 + 0.5) * 255)));
      colors.push(lut[t * 3] / 255, lut[t * 3 + 1] / 255, lut[t * 3 + 2] / 255);
    }
  }
  const indices = [];
  for (let r = 0; r < RINGS; r++) {
    for (let s = 0; s < SEG; s++) {
      const a = r * (SEG + 1) + s, b = a + SEG + 1;
      indices.push(a, b, a + 1, b, b + 1, a + 1);
    }
  }
  return {
    positions: new Float32Array(positions),
    normals: new Float32Array(normals),
    colors: new Float32Array(colors),
    indices: new Uint32Array(indices),
  };
}

/** Gradient depth PNG rendered through the real PLASMA LUT. */
export function demoDepthDataUrl(w = 320, h = 240) {
  const cv = document.createElement("canvas");
  cv.width = w; cv.height = h;
  const ctx = cv.getContext("2d");
  const im = ctx.createImageData(w, h);
  const lut = plasmaLUT();
  for (let v = 0; v < h; v++) {
    for (let u = 0; u < w; u++) {
      const cx = u / w - 0.5, cy = v / h - 0.5;
      const d = Math.max(0, Math.min(1, 1 - Math.hypot(cx * 1.6, cy * 1.9)));
      const t = Math.round(d * 255);
      const o = (v * w + u) * 4;
      im.data[o] = lut[t * 3];
      im.data[o + 1] = lut[t * 3 + 1];
      im.data[o + 2] = lut[t * 3 + 2];
      im.data[o + 3] = 255;
    }
  }
  ctx.putImageData(im, 0, 0);
  return cv.toDataURL("image/png");
}

/** Full fabricated results payload (App.jsx:1164-1229 generateDemoResults). */
export function demoResults() {
  const { positions, colors } = demoPointCloud();
  const n = positions.length / 3;
  const pts = [], cols = [];
  for (let i = 0; i < n; i++) {
    pts.push([positions[i * 3], positions[i * 3 + 1], positions[i * 3 + 2]]);
    cols.push([
      Math.round(colors[i * 3] * 255),
      Math.round(colors[i * 3 + 1] * 255),
      Math.round(colors[i * 3 + 2] * 255),
    ]);
  }
  return {
    pointCloud: { points: n, format: "DEMO" },
    gisData: {
      bounds: {
        minX: -6, maxX: 6, minY: -2, maxY: 2, minZ: -4.5, maxZ: 4.5,
      },
      pointCount: n,
      coordinateSystem: "local",
      demo: true,
    },
    downloadUrl: null,
    preview: { points: pts, colors: cols },
    meshPreview: null,
    depthMap: demoDepthDataUrl(),
  };
}

function mulberry32(seed) {
  let a = seed >>> 0;
  return () => {
    a |= 0; a = (a + 0x6d2b79f5) | 0;
    let t = Math.imul(a ^ (a >>> 15), 1 | a);
    t = (t + Math.imul(t ^ (t >>> 7), 61 | t)) ^ t;
    return ((t ^ (t >>> 14)) >>> 0) / 4294967296;
  };
}

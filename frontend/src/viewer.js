// WebGL2 3D viewer: point clouds + meshes with spherical orbit controls.
//
// First-party equivalent of the reference's Three.js viewer
// (reference frontend/src/App.jsx:280-650): perspective camera (75°),
// 0x0a0b0f-class background, grid + axes helpers, custom
// spherical-orbit mouse controls with wheel dolly, bbox-driven auto
// camera framing (×1.8 points / ×2.5 mesh), point size with
// attenuation, double-sided shaded mesh with wireframe toggle,
// auto-rotate, resize handling, and a rAF render loop.

import {
  compileProgram, makeBuffer,
  mat4LookAt, mat4Multiply, mat4Perspective,
  vadd, vcross, vnorm, vscale, vsub,
} from "./gl.js";

const POINT_VS = `#version 300 es
precision highp float;
in vec3 aPos;
in vec3 aCol;
uniform mat4 uMVP;
uniform float uPointSize;   // pixels at distance 1
out vec3 vCol;
void main() {
  gl_Position = uMVP * vec4(aPos, 1.0);
  float att = uPointSize / max(gl_Position.w, 1e-3);
  gl_PointSize = clamp(att, 1.0, 64.0);
  vCol = aCol;
}`;

const POINT_FS = `#version 300 es
precision highp float;
in vec3 vCol;
out vec4 frag;
void main() {
  vec2 d = gl_PointCoord - vec2(0.5);
  if (dot(d, d) > 0.25) discard;   // round sprites
  frag = vec4(vCol, 1.0);
}`;

const MESH_VS = `#version 300 es
precision highp float;
in vec3 aPos;
in vec3 aNormal;
in vec3 aCol;
uniform mat4 uMVP;
uniform vec3 uEye;
out vec3 vCol;
out vec3 vNormal;
out vec3 vToEye;
void main() {
  gl_Position = uMVP * vec4(aPos, 1.0);
  vCol = aCol;
  vNormal = aNormal;
  vToEye = uEye - aPos;
}`;

const MESH_FS = `#version 300 es
precision highp float;
in vec3 vCol;
in vec3 vNormal;
in vec3 vToEye;
out vec4 frag;
void main() {
  vec3 n = normalize(vNormal);
  vec3 l = normalize(vToEye);          // headlight
  if (!gl_FrontFacing) n = -n;         // double-sided (App.jsx mesh material)
  float diff = 0.35 + 0.65 * max(dot(n, l), 0.0);
  vec3 h = l;                          // light == view → half vector == l
  float spec = 0.15 * pow(max(dot(n, h), 0.0), 24.0);
  frag = vec4(vCol * diff + vec3(spec), 1.0);
}`;

const LINE_VS = `#version 300 es
precision highp float;
in vec3 aPos;
in vec3 aCol;
uniform mat4 uMVP;
out vec3 vCol;
void main() { gl_Position = uMVP * vec4(aPos, 1.0); vCol = aCol; }`;

const LINE_FS = `#version 300 es
precision highp float;
in vec3 vCol;
out vec4 frag;
void main() { frag = vec4(vCol, 1.0); }`;

export class Viewer {
  constructor(canvas, { onDebug } = {}) {
    this.canvas = canvas;
    const gl = canvas.getContext("webgl2", { antialias: true });
    if (!gl) throw new Error("WebGL2 unavailable");
    this.gl = gl;
    this.progPoint = compileProgram(gl, POINT_VS, POINT_FS);
    this.progMesh = compileProgram(gl, MESH_VS, MESH_FS);
    this.progLine = compileProgram(gl, LINE_VS, LINE_FS);
    this.onDebug = onDebug || (() => {});

    // Spherical orbit state (App.jsx custom controls).
    this.theta = Math.PI / 4;
    this.phi = Math.PI / 3;
    this.radius = 12;
    this.target = [0, 0, 0];
    this.home = null; // saved framing for resetCamera
    this.fovy = (75 * Math.PI) / 180;

    this.options = {
      autoRotate: false, showGrid: true, showAxes: true,
      wireframe: false, pointSize: 2,
    };

    this.points = null;   // {buf posBuf/colBuf, count, bbox}
    this.mesh = null;     // {posBuf,normBuf,colBuf,idxBuf,edgeBuf,count,edgeCount,bbox}
    this._helpers = null; // grid/axes line buffers
    this._buildHelpers(10);

    this._bindControls();
    const ro = new ResizeObserver(() => this._resize());
    ro.observe(canvas.parentElement || canvas);
    this._resize();
    const loop = () => {
      if (this.options.autoRotate) this.theta += 0.005;
      this._draw();
      requestAnimationFrame(loop);
    };
    requestAnimationFrame(loop);
  }

  // ---------- content ----------

  clearScene() {
    this._disposeContent();
  }

  // GPU buffers must be explicitly freed when content is replaced —
  // regenerating large clouds would otherwise leak multi-MB buffers per
  // click until the WebGL context is lost (App.jsx disposes geometry in
  // clearScene for the same reason).
  _disposeContent() {
    const gl = this.gl;
    for (const obj of [this.points, this.mesh]) {
      if (!obj) continue;
      for (const k of ["posBuf", "colBuf", "normBuf", "idxBuf", "edgeBuf"]) {
        if (obj[k]) gl.deleteBuffer(obj[k]);
      }
    }
    // Deleting a buffer nulls its binding in the default VAO but leaves
    // the attrib LOCATIONS enabled; a later program that binds fewer
    // attribs (mesh→points switch) would then draw with an enabled
    // null-buffer array — INVALID_OPERATION on every draw (blank
    // viewer). Disable everything; _attrib re-enables what each draw
    // needs.
    const maxAttribs = gl.getParameter(gl.MAX_VERTEX_ATTRIBS);
    for (let i = 0; i < maxAttribs; i++) gl.disableVertexAttribArray(i);
    this.points = null;
    this.mesh = null;
  }

  setPointCloud(positions, colors) {
    const gl = this.gl;
    this._disposeContent();
    const n = (positions.length / 3) | 0;
    const bbox = computeBBox(positions);
    this.points = {
      posBuf: makeBuffer(gl, positions),
      colBuf: makeBuffer(gl, colors),
      count: n,
      bbox,
    };
    this.frameBBox(bbox, 1.8); // App.jsx:486-573 framing factor
  }

  setMesh({ positions, normals, colors, indices }) {
    const gl = this.gl;
    this._disposeContent();
    const bbox = computeBBox(positions);
    // Edge index buffer for the wireframe toggle.
    const edges = new Uint32Array(indices.length * 2);
    for (let i = 0; i < indices.length; i += 3) {
      const [a, b, c] = [indices[i], indices[i + 1], indices[i + 2]];
      edges.set([a, b, b, c, c, a], i * 2);
    }
    this.mesh = {
      posBuf: makeBuffer(gl, positions),
      normBuf: makeBuffer(gl, normals),
      colBuf: makeBuffer(gl, colors),
      idxBuf: makeBuffer(gl, indices, gl.ELEMENT_ARRAY_BUFFER),
      edgeBuf: makeBuffer(gl, edges, gl.ELEMENT_ARRAY_BUFFER),
      count: indices.length,
      edgeCount: edges.length,
      bbox,
    };
    this.frameBBox(bbox, 2.5); // mesh framing factor (App.jsx displayMeshData)
  }

  // ---------- camera ----------

  frameBBox(bbox, factor) {
    const size = vsub(bbox.max, bbox.min);
    const maxDim = Math.max(size[0], size[1], size[2], 1e-6);
    this.target = vscale(vadd(bbox.min, bbox.max), 0.5);
    this.radius = maxDim * factor;
    this.theta = Math.PI / 4;
    this.phi = Math.PI / 3;
    this.home = {
      target: [...this.target], radius: this.radius,
      theta: this.theta, phi: this.phi,
    };
    this._buildHelpers(niceGridSize(maxDim));
  }

  resetCamera() {
    if (!this.home) return;
    this.target = [...this.home.target];
    this.radius = this.home.radius;
    this.theta = this.home.theta;
    this.phi = this.home.phi;
  }

  zoomToExtent() {
    // Union of whatever is displayed (App.jsx zoomToExtent traverse).
    const obj = this.points || this.mesh;
    if (obj) this.frameBBox(obj.bbox, this.points ? 1.8 : 2.5);
  }

  eye() {
    const sp = Math.sin(this.phi), cp = Math.cos(this.phi);
    const st = Math.sin(this.theta), ct = Math.cos(this.theta);
    return vadd(this.target, vscale([sp * st, cp, sp * ct], this.radius));
  }

  // ---------- internals ----------

  _bindControls() {
    const c = this.canvas;
    let drag = null;
    c.addEventListener("pointerdown", (e) => {
      drag = { x: e.clientX, y: e.clientY, pan: e.button === 2 || e.shiftKey };
      c.setPointerCapture(e.pointerId);
    });
    c.addEventListener("contextmenu", (e) => e.preventDefault());
    c.addEventListener("pointermove", (e) => {
      if (!drag) return;
      const dx = e.clientX - drag.x, dy = e.clientY - drag.y;
      drag.x = e.clientX; drag.y = e.clientY;
      if (drag.pan) {
        const eye = this.eye();
        const fwd = vnorm(vsub(this.target, eye));
        const right = vnorm(vcross(fwd, [0, 1, 0]));
        const up = vcross(right, fwd);
        const s = this.radius * 0.0016;
        this.target = vadd(
          this.target,
          vadd(vscale(right, -dx * s), vscale(up, dy * s)),
        );
      } else {
        this.theta -= dx * 0.008;
        this.phi = Math.min(Math.PI - 0.05, Math.max(0.05, this.phi - dy * 0.008));
      }
    });
    const end = () => { drag = null; };
    c.addEventListener("pointerup", end);
    c.addEventListener("pointercancel", end);
    c.addEventListener("wheel", (e) => {
      e.preventDefault();
      // Wheel dolly; reference clamps 2–50 (App.jsx wheel handler) — the
      // upper clamp scales with the framed scene so large clouds stay
      // reachable.
      const maxR = Math.max(50, (this.home ? this.home.radius : 12) * 4);
      this.radius = Math.min(maxR, Math.max(0.5,
        this.radius * Math.exp(e.deltaY * 0.0012)));
    }, { passive: false });
  }

  _resize() {
    const c = this.canvas;
    const dpr = window.devicePixelRatio || 1;
    const w = Math.max(1, Math.floor(c.clientWidth * dpr));
    const h = Math.max(1, Math.floor(c.clientHeight * dpr));
    if (c.width !== w || c.height !== h) { c.width = w; c.height = h; }
  }

  _buildHelpers(halfExtent) {
    const gl = this.gl;
    if (this._helpers) {
      gl.deleteBuffer(this._helpers.posBuf);
      gl.deleteBuffer(this._helpers.colBuf);
      this._helpers = null;
    }
    const verts = [], cols = [];
    const n = 10, step = halfExtent / n;
    const cGrid = [0.16, 0.18, 0.24], cMid = [0.28, 0.3, 0.38];
    for (let i = -n; i <= n; i++) {
      const t = i * step, col = i === 0 ? cMid : cGrid;
      verts.push(-halfExtent, 0, t, halfExtent, 0, t);
      verts.push(t, 0, -halfExtent, t, 0, halfExtent);
      for (let k = 0; k < 4; k++) cols.push(...col);
    }
    const gridCount = verts.length / 3;
    // Axes: X red, Y green, Z blue.
    const L = halfExtent * 0.6;
    verts.push(0,0,0, L,0,0); cols.push(0.9,0.25,0.25, 0.9,0.25,0.25);
    verts.push(0,0,0, 0,L,0); cols.push(0.25,0.9,0.4, 0.25,0.9,0.4);
    verts.push(0,0,0, 0,0,L); cols.push(0.3,0.5,0.95, 0.3,0.5,0.95);
    this._helpers = {
      posBuf: makeBuffer(gl, new Float32Array(verts)),
      colBuf: makeBuffer(gl, new Float32Array(cols)),
      gridCount,
      axesCount: 6,
    };
  }

  _attrib(prog, name, buf, size) {
    const gl = this.gl;
    const loc = gl.getAttribLocation(prog, name);
    if (loc < 0) return;
    gl.bindBuffer(gl.ARRAY_BUFFER, buf);
    gl.enableVertexAttribArray(loc);
    gl.vertexAttribPointer(loc, size, gl.FLOAT, false, 0, 0);
  }

  _draw() {
    const gl = this.gl, c = this.canvas;
    this._resize();
    gl.viewport(0, 0, c.width, c.height);
    gl.clearColor(0.027, 0.031, 0.047, 1); // 0x0a0b0f (App.jsx scene bg)
    gl.clear(gl.COLOR_BUFFER_BIT | gl.DEPTH_BUFFER_BIT);
    gl.enable(gl.DEPTH_TEST);

    const eye = this.eye();
    const view = mat4LookAt(eye, this.target, [0, 1, 0]);
    const proj = mat4Perspective(this.fovy, c.width / c.height, 0.01, 5000);
    const mvp = mat4Multiply(proj, view);

    if (this._helpers && (this.options.showGrid || this.options.showAxes)) {
      gl.useProgram(this.progLine);
      gl.uniformMatrix4fv(gl.getUniformLocation(this.progLine, "uMVP"), false, mvp);
      this._attrib(this.progLine, "aPos", this._helpers.posBuf, 3);
      this._attrib(this.progLine, "aCol", this._helpers.colBuf, 3);
      if (this.options.showGrid) gl.drawArrays(gl.LINES, 0, this._helpers.gridCount);
      if (this.options.showAxes) {
        gl.drawArrays(gl.LINES, this._helpers.gridCount, this._helpers.axesCount);
      }
    }

    if (this.points) {
      gl.useProgram(this.progPoint);
      gl.uniformMatrix4fv(gl.getUniformLocation(this.progPoint, "uMVP"), false, mvp);
      // PointsMaterial size ≈ pointSize·0.02·scene with attenuation
      // (App.jsx:486-573). World-space point size projected to pixels:
      // px = world · (viewportH / (2·tan(fovy/2))) / w — the shader
      // divides by w, so pass the numerator here.
      const world = this.options.pointSize * 0.01 *
        (this.home ? this.home.radius : 10);
      const projScale = c.height / (2 * Math.tan(this.fovy / 2));
      gl.uniform1f(
        gl.getUniformLocation(this.progPoint, "uPointSize"), world * projScale,
      );
      this._attrib(this.progPoint, "aPos", this.points.posBuf, 3);
      this._attrib(this.progPoint, "aCol", this.points.colBuf, 3);
      gl.drawArrays(gl.POINTS, 0, this.points.count);
    }

    if (this.mesh) {
      const m = this.mesh;
      if (this.options.wireframe) {
        gl.useProgram(this.progLine);
        gl.uniformMatrix4fv(gl.getUniformLocation(this.progLine, "uMVP"), false, mvp);
        this._attrib(this.progLine, "aPos", m.posBuf, 3);
        this._attrib(this.progLine, "aCol", m.colBuf, 3);
        gl.bindBuffer(gl.ELEMENT_ARRAY_BUFFER, m.edgeBuf);
        gl.drawElements(gl.LINES, m.edgeCount, gl.UNSIGNED_INT, 0);
      } else {
        gl.useProgram(this.progMesh);
        gl.uniformMatrix4fv(gl.getUniformLocation(this.progMesh, "uMVP"), false, mvp);
        gl.uniform3f(gl.getUniformLocation(this.progMesh, "uEye"), ...eye);
        this._attrib(this.progMesh, "aPos", m.posBuf, 3);
        this._attrib(this.progMesh, "aNormal", m.normBuf, 3);
        this._attrib(this.progMesh, "aCol", m.colBuf, 3);
        gl.bindBuffer(gl.ELEMENT_ARRAY_BUFFER, m.idxBuf);
        gl.drawElements(gl.TRIANGLES, m.count, gl.UNSIGNED_INT, 0);
      }
    }

    const nObj = this.points ? this.points.count : this.mesh ? this.mesh.count / 3 : 0;
    this.onDebug(
      `${this.points ? "points" : this.mesh ? "tris" : "objects"}: ${nObj}\n` +
      `cam: ${eye.map((v) => v.toFixed(1)).join(", ")}  r=${this.radius.toFixed(1)}`,
    );
  }
}

function computeBBox(positions) {
  const min = [Infinity, Infinity, Infinity];
  const max = [-Infinity, -Infinity, -Infinity];
  for (let i = 0; i < positions.length; i += 3) {
    for (let k = 0; k < 3; k++) {
      const v = positions[i + k];
      if (v < min[k]) min[k] = v;
      if (v > max[k]) max[k] = v;
    }
  }
  if (!isFinite(min[0])) return { min: [0, 0, 0], max: [0, 0, 0] };
  return { min, max };
}

function niceGridSize(maxDim) {
  const raw = maxDim * 0.9;
  const mag = Math.pow(10, Math.floor(Math.log10(Math.max(raw, 1e-6))));
  for (const m of [1, 2, 5, 10]) if (m * mag >= raw) return m * mag;
  return 10 * mag;
}

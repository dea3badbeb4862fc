// Interactive depth-map viewer: wheel zoom 0.5–10×, drag pan (scaled
// by zoom), hover position readout, reset. Reused by the inline panel
// and the fullscreen modal — feature parity with the reference's
// depth-map interaction handlers (reference frontend/src/App.jsx:
// 1058-1104, fullscreen modal 1820-1904).

export class DepthView {
  constructor(container, img, posLabel) {
    this.container = container;
    this.img = img;
    this.posLabel = posLabel;
    this.zoom = 1;
    this.pan = { x: 0, y: 0 };
    this._bind();
  }

  setImage(dataUrl) {
    if (!dataUrl) {
      this.img.hidden = true;
      return;
    }
    this.img.src = dataUrl;
    this.img.hidden = false;
    this.img.onload = () => this.reset();
  }

  reset() {
    this.zoom = 1;
    // Fit image into the container at zoom 1.
    const cw = this.container.clientWidth, ch = this.container.clientHeight;
    const iw = this.img.naturalWidth || 1, ih = this.img.naturalHeight || 1;
    this.fit = Math.min(cw / iw, ch / ih);
    this.pan = {
      x: (cw - iw * this.fit) / 2,
      y: (ch - ih * this.fit) / 2,
    };
    this._apply();
  }

  _apply() {
    const s = (this.fit || 1) * this.zoom;
    this.img.style.transform =
      `translate(${this.pan.x}px, ${this.pan.y}px) scale(${s})`;
  }

  _bind() {
    const el = this.container;
    let drag = null;
    el.addEventListener("wheel", (e) => {
      e.preventDefault();
      const prev = this.zoom;
      this.zoom = Math.min(10, Math.max(0.5,
        this.zoom * Math.exp(-e.deltaY * 0.0015)));
      // Zoom about the cursor.
      const r = el.getBoundingClientRect();
      const cx = e.clientX - r.left, cy = e.clientY - r.top;
      const k = this.zoom / prev;
      this.pan.x = cx - (cx - this.pan.x) * k;
      this.pan.y = cy - (cy - this.pan.y) * k;
      this._apply();
    }, { passive: false });
    el.addEventListener("pointerdown", (e) => {
      drag = { x: e.clientX, y: e.clientY };
      el.setPointerCapture(e.pointerId);
    });
    el.addEventListener("pointermove", (e) => {
      const r = el.getBoundingClientRect();
      const s = (this.fit || 1) * this.zoom;
      const px = (e.clientX - r.left - this.pan.x) / s;
      const py = (e.clientY - r.top - this.pan.y) / s;
      const iw = this.img.naturalWidth || 1, ih = this.img.naturalHeight || 1;
      if (px >= 0 && py >= 0 && px <= iw && py <= ih && !this.img.hidden) {
        this.posLabel.textContent =
          `${((px / iw) * 100).toFixed(0)}%, ${((py / ih) * 100).toFixed(0)}%` +
          `  ·  ${(this.zoom).toFixed(1)}×`;
      } else {
        this.posLabel.textContent = "";
      }
      if (!drag) return;
      this.pan.x += e.clientX - drag.x;
      this.pan.y += e.clientY - drag.y;
      drag = { x: e.clientX, y: e.clientY };
      this._apply();
    });
    const end = () => { drag = null; };
    el.addEventListener("pointerup", end);
    el.addEventListener("pointercancel", end);
  }
}

// Client-side depth→point-cloud fallback: rebuilds a displayable cloud
// from the colorized depth preview PNG plus the original image, used
// when the backend preview array is unavailable (reference
// frontend/src/App.jsx:124-277). The reference inverts the PLASMA
// colormap heuristically (yellow≈0.9, purple≈0.1, luminance blend,
// App.jsx:200-221); here the exact 256-entry PLASMA LUT (identical to
// the backend's ops/colormap table) is inverted by nearest color —
// strictly more faithful, same role.

const PLASMA_B64 =
  "DQiHEAeIEweJFgeKGQaMGwaNHQaOIAaPIgaQJAaRJgWRKAWSKgWTLAWULgWVLwWWMQWXMwWXNQSY" +
  "NwSZOASaOgSaPASbPgScPwScQQSdQwOeRAOeRgOfSAOfSQOgSwOhTAKhTgKiUAKiUQKjUwKjVQKk" +
  "VgGkWAGkWQGlWwGlXAGmXgGmYAGmYQCnYwCnZACnZgCnZwCoaQCoagCobACobgCobwCocQCocgGo" +
  "dAGodQGodwGoeAGoegKoewKofQOofgOogASogQSngwWnhAWnhgamhwemiAimigmliwqljQuljgyk" +
  "jw2kkQ6jkg+jlBCilRGhlhOhmBSgmRWfmhafnBeenRidnhmdoBqcoRuboh2aox6apR+ZpiCYpyGX" +
  "qCKWqiOVqySUrCaUrSeTriiSsCmRsSqQsiuPsyyOtC6NtS+MtjCLtzGKuDKJujOIuzSIvDWHvTeG" +
  "vjiFvzmEwDqDwTuCwjyBwz2AxD5/xUB+xkF9x0J8yEN7yUR6ykV6y0Z5zEd4zEl3zUp2zkt1z0x0" +
  "0E1z0U5y0k9x01Fx1FJw1VNv1VRu1lVt11Zs2Fdr2Vhq2lpq2ltp21xo3F1n3V5m3l9l3mFk32Jj" +
  "4GNj4WRi4mVh4mZg42hf5Gle5Wpd5Wtd5mxc525b529a6HBZ6XFY6XJX6nRX63VW63ZV7HdU7XlT" +
  "7XpS7ntR73xR735Q8H9P8IBO8YFN8YNM8oRL84VL84dK9IhJ9IlI9YtH9YxG9o1F9o9E95BE95FD" +
  "95NC+JRB+JVA+Zc/+Zg++Zo++ps9+pw8+p47+586+6E5+6I4/KM4/KU3/KY2/Kg1/Kk0/asz/awz" +
  "/a4y/a8x/bEw/bIv/bQv/bUu/rct/rgs/ros/rsr/r0q/r4q/sAp/cIp/cMo/cUn/cYn/cgn/com" +
  "/csm/M0l/M4l/NAl/NIl+9Mk+9Uk+9ck+tgk+tok+dwk+d0l+N8l+OEl9+Il9+Ql9uYm9ugm9ekm" +
  "9esn9O0n8+4n8/An8vIn8fQm8fUl8Pck8Pkh";

let _lut = null;
export function plasmaLUT() {
  if (!_lut) {
    const raw = atob(PLASMA_B64);
    _lut = new Uint8Array(raw.length);
    for (let i = 0; i < raw.length; i++) _lut[i] = raw.charCodeAt(i);
  }
  return _lut; // 256*3 RGB
}

// O(1) inverse: exact LUT colors resolve through a hash map (the
// "exact inverse" property the backend preview round-trip relies on);
// blended pixels (canvas rescaling) fall back to a 32x32x32 quantized
// nearest-cell table built once (~8M one-time ops). The previous
// per-pixel 256-entry scan ran ~23M comparisons per 300x300 decode on
// the UI thread.
let _inv = null, _exact = null;
function buildInverse() {
  if (_inv) return;
  const lut = plasmaLUT();
  _exact = new Map();
  for (let i = 0; i < 256; i++) {
    const key = (lut[i * 3] << 16) | (lut[i * 3 + 1] << 8) | lut[i * 3 + 2];
    if (!_exact.has(key)) _exact.set(key, i); // first wins, like the scan
  }
  _inv = new Uint8Array(32 * 32 * 32);
  for (let cr = 0; cr < 32; cr++) {
    for (let cg = 0; cg < 32; cg++) {
      for (let cb = 0; cb < 32; cb++) {
        const r = cr * 8 + 4, g = cg * 8 + 4, b = cb * 8 + 4; // cell center
        let best = 0, bestD = Infinity;
        for (let i = 0; i < 256; i++) {
          const dr = r - lut[i * 3], dg = g - lut[i * 3 + 1],
                db = b - lut[i * 3 + 2];
          const d = dr * dr + dg * dg + db * db;
          if (d < bestD) { bestD = d; best = i; }
        }
        _inv[(cr << 10) | (cg << 5) | cb] = best;
      }
    }
  }
}

function inversePlasma(r, g, b) {
  // Nearest LUT entry → normalized depth in [0, 1].
  buildInverse();
  const exact = _exact.get((r << 16) | (g << 8) | b);
  if (exact !== undefined) return exact / 255;
  return _inv[((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)] / 255;
}

const MAX_WORK_DIM = 300; // client-side working resolution (App.jsx:153)

function drawScaled(img, w, h) {
  const cv = document.createElement("canvas");
  cv.width = w; cv.height = h;
  const ctx = cv.getContext("2d", { willReadFrequently: true });
  ctx.drawImage(img, 0, 0, w, h);
  return ctx.getImageData(0, 0, w, h).data;
}

function loadImage(src) {
  return new Promise((resolve, reject) => {
    const im = new Image();
    im.onload = () => resolve(im);
    im.onerror = reject;
    im.src = src;
  });
}

/**
 * Decode the colorized depth data-URL (+ original image for colors) into
 * {positions: Float32Array, colors: Float32Array} for the viewer.
 * Mirrors App.jsx generatePointCloudFromDepthMap: ≤300 px working size,
 * drop depth outside [0.05, 0.95], heightfield world mapping with the
 * Y/Z swap and centering.
 */
export async function cloudFromDepthMap(depthUrl, imageUrl, settings = {}) {
  const depthImg = await loadImage(depthUrl);
  const iw = depthImg.naturalWidth, ih = depthImg.naturalHeight;
  const scale = Math.min(1, MAX_WORK_DIM / Math.max(iw, ih));
  const w = Math.max(1, Math.round(iw * scale));
  const h = Math.max(1, Math.round(ih * scale));
  const depthPix = drawScaled(depthImg, w, h);
  let colorPix = null;
  if (imageUrl) {
    try {
      colorPix = drawScaled(await loadImage(imageUrl), w, h);
    } catch { /* fall back to depth colors */ }
  }

  // The backend preview PNG already has invert_depth baked in
  // (create_depth_preview applies it before colormapping), so default
  // to NOT re-inverting; callers opt in for raw colormaps.
  const invert = settings.reinvert ?? false;
  const depthScale = (settings.depthScale ?? 15) / 3;
  const positions = [], colors = [];
  const ext = 10, aspect = h / w;
  for (let v = 0; v < h; v++) {
    for (let u = 0; u < w; u++) {
      const o = (v * w + u) * 4;
      let d = inversePlasma(depthPix[o], depthPix[o + 1], depthPix[o + 2]);
      if (d < 0.05 || d > 0.95) continue; // background/extremes dropped
      if (invert) d = 1 - d;
      // Heightfield mapping, Y up (image v → world Z: the Y/Z swap).
      positions.push(
        ((u / w) - 0.5) * ext,
        d * depthScale,
        ((v / h) - 0.5) * ext * aspect,
      );
      const src = colorPix || depthPix;
      colors.push(src[o] / 255, src[o + 1] / 255, src[o + 2] / 255);
    }
  }
  return {
    positions: new Float32Array(positions),
    colors: new Float32Array(colors),
  };
}

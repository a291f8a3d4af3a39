/* Drawing client for the TPU brushstroke engine.
 *
 * Fresh implementation of the two-canvas drawing architecture the reference
 * UI describes (forger/ui/README.md): strokeCanvas holds the raw user
 * geometry (what the model conditions on), paintCanvas holds the GAN
 * renders.  While drawing, dirty patch windows of the model's patch width
 * are sent over a binary websocket; responses are composited back.
 * Wire protocol: see brushstroke_engine_tpu/ui/protocol.py.
 */
(function () {
  "use strict";

  const paint = document.getElementById("paintCanvas");
  const stroke = document.getElementById("strokeCanvas");
  const pctx = paint.getContext("2d");
  const sctx = stroke.getContext("2d");
  const status = document.getElementById("status");

  let patchWidth = 256;
  let cropMargin = 10;
  let drawing = false;
  let brushRadius = 8;
  let dirty = null; // {x0,y0,x1,y1}
  let pending = 0;

  const ws = new WebSocket(
    (location.protocol === "https:" ? "wss://" : "ws://") + location.host +
    "/websocket/");
  ws.binaryType = "arraybuffer";

  ws.onopen = function () {
    status.textContent = "connected";
    // Sync the initial control state: the server's defaults are not
    // guaranteed to match the checkboxes' initial values.
    sendJSON({ type: "set_option", option: "positions",
               value: document.getElementById("usePositions").checked });
    sendJSON({ type: "set_option", option: "uvs_mapping",
               value: document.getElementById("uvsMapping").checked });
    sendJSON({ type: "set_render_mode",
               mode: document.getElementById("renderMode").value });
    sendNewCanvas();
  };
  ws.onclose = function () { status.textContent = "disconnected"; };

  ws.onmessage = function (ev) {
    if (typeof ev.data === "string") {
      const msg = JSON.parse(ev.data);
      if (msg.type === "modelinfo") {
        patchWidth = msg.data.patch_width;
        status.textContent = "ready (patch " + patchWidth + ")";
      } else if (msg.type === "brushinfo") {
        status.textContent = "brush " + msg.data.style_id +
          (msg.data.library_id ? " / " + msg.data.library_id : "");
      }
      return;
    }
    // Binary response: [type i32][w,h,x,y i32][RGBA].
    const dv = new DataView(ev.data);
    const rtype = dv.getInt32(0, true);
    if (rtype === 1) { pending--; return; } // debug image: ignored here
    const w = dv.getInt32(4, true);
    const h = dv.getInt32(8, true);
    const x = dv.getInt32(12, true);
    const y = dv.getInt32(16, true);
    const pixels = new Uint8ClampedArray(ev.data, 20, w * h * 4);
    const img = new ImageData(pixels, w, h);
    // Composite with alpha onto the paint canvas.
    const off = new OffscreenCanvas(w, h);
    off.getContext("2d").putImageData(img, 0, 0);
    pctx.clearRect(x, y, w, h);
    pctx.drawImage(off, x, y);
    pending--;
  };

  function sendJSON(obj) { ws.send(JSON.stringify(obj)); }

  function sendNewCanvas() {
    sendJSON({
      type: "new_canvas", rows: paint.height, cols: paint.width,
      feature_blending:
        parseInt(document.getElementById("featureBlending").value, 10)
    });
  }

  function hexToRgb(hex) {
    return [parseInt(hex.slice(1, 3), 16), parseInt(hex.slice(3, 5), 16),
            parseInt(hex.slice(5, 7), 16)];
  }

  function buildColorList() {
    if (!document.getElementById("useColors").checked) return [];
    const c0 = hexToRgb(document.getElementById("color0").value);
    const c1 = hexToRgb(document.getElementById("color1").value);
    return [[0].concat(c0), [1].concat(c1)];
  }

  function sendPatch(px, py) {
    // Clamp to canvas bounds.
    px = Math.max(0, Math.min(px, stroke.width - patchWidth));
    py = Math.max(0, Math.min(py, stroke.height - patchWidth));
    const data = sctx.getImageData(px, py, patchWidth, patchWidth);
    const colors = buildColorList();
    const head = new Uint8Array(3 + 4 * colors.length);
    head[0] = 0; head[1] = colors.length; head[2] = 0;
    colors.forEach(function (c, i) {
      head.set(c, 3 + 4 * i);
    });
    const meta = new Int32Array(
      [patchWidth, patchWidth, px, py, cropMargin]);
    const buf = new Uint8Array(
      head.length + meta.byteLength + data.data.length);
    buf.set(head, 0);
    buf.set(new Uint8Array(meta.buffer), head.length);
    buf.set(data.data, head.length + meta.byteLength);
    pending++;
    ws.send(buf.buffer);
  }

  function flushDirty() {
    if (!dirty) return;
    const stride = patchWidth - 2 * cropMargin;
    for (let y = dirty.y0 - cropMargin; y < dirty.y1; y += stride) {
      for (let x = dirty.x0 - cropMargin; x < dirty.x1; x += stride) {
        sendPatch(x, y);
      }
    }
    dirty = null;
  }

  function markDirty(x, y) {
    const r = brushRadius + 2;
    if (!dirty) dirty = { x0: x - r, y0: y - r, x1: x + r, y1: y + r };
    dirty.x0 = Math.min(dirty.x0, x - r);
    dirty.y0 = Math.min(dirty.y0, y - r);
    dirty.x1 = Math.max(dirty.x1, x + r);
    dirty.y1 = Math.max(dirty.y1, y + r);
    // Flush early if the dirty window exceeds half a patch.
    if (dirty.x1 - dirty.x0 > patchWidth / 2 ||
        dirty.y1 - dirty.y0 > patchWidth / 2) {
      flushDirty();
    }
  }

  function canvasPos(ev) {
    const rect = stroke.getBoundingClientRect();
    return [ev.clientX - rect.left, ev.clientY - rect.top];
  }

  // ---- undo/redo: snapshot both canvases per completed stroke ----
  // (reference client keeps a layer/undo stack; forger/ui/README.md)
  const undoStack = [];
  const redoStack = [];
  const UNDO_LIMIT = 24;

  function snapshot() {
    return {
      s: sctx.getImageData(0, 0, stroke.width, stroke.height),
      p: pctx.getImageData(0, 0, paint.width, paint.height)
    };
  }

  function restore(snap) {
    sctx.putImageData(snap.s, 0, 0);
    pctx.putImageData(snap.p, 0, 0);
    // Server-side geometry canvas must match the stroke canvas again.
    sendNewCanvas();
    resendAll();
  }

  function resendAll() {
    // Re-render the whole (restored) geometry canvas patch by patch.
    const stride = patchWidth - 2 * cropMargin;
    for (let y = 0; y < stroke.height; y += stride) {
      for (let x = 0; x < stroke.width; x += stride) {
        sendPatch(x, y);
      }
    }
  }

  function pushUndo() {
    undoStack.push(snapshot());
    if (undoStack.length > UNDO_LIMIT) undoStack.shift();
    redoStack.length = 0;
  }

  function undo() {
    if (!undoStack.length) return;
    redoStack.push(snapshot());
    restore(undoStack.pop());
  }

  function redo() {
    if (!redoStack.length) return;
    undoStack.push(snapshot());
    restore(redoStack.pop());
  }

  let last = null;
  stroke.addEventListener("pointerdown", function (ev) {
    drawing = true;
    pushUndo();
    last = canvasPos(ev);
    brushRadius = parseInt(
      document.getElementById("brushSize").value, 10);
    const erasing = document.getElementById("eraser").checked;
    sctx.lineCap = "round";
    sctx.lineJoin = "round";
    sctx.globalCompositeOperation =
      erasing ? "destination-out" : "source-over";
    sctx.strokeStyle = "rgba(0,0,0,1)";
    sctx.lineWidth = brushRadius * 2;
    markDirty(last[0], last[1]);
  });
  stroke.addEventListener("pointermove", function (ev) {
    if (!drawing) return;
    const pos = canvasPos(ev);
    sctx.beginPath();
    sctx.moveTo(last[0], last[1]);
    sctx.lineTo(pos[0], pos[1]);
    sctx.stroke();
    markDirty(pos[0], pos[1]);
    last = pos;
  });
  window.addEventListener("pointerup", function () {
    if (!drawing) return;
    drawing = false;
    flushDirty();
  });

  // ---- controls ----
  document.getElementById("newBrush").onclick = function () {
    sendJSON({ type: "set_brush" });
  };
  document.getElementById("saveBrush").onclick = function () {
    sendJSON({ type: "save_brush" });
  };
  document.getElementById("clearCanvas").onclick = function () {
    sctx.clearRect(0, 0, stroke.width, stroke.height);
    pctx.clearRect(0, 0, paint.width, paint.height);
    sendNewCanvas();
  };
  document.getElementById("renderMode").onchange = function (ev) {
    sendJSON({ type: "set_render_mode", mode: ev.target.value });
  };
  document.getElementById("uvsMapping").onchange = function (ev) {
    sendJSON({ type: "set_option", option: "uvs_mapping",
               value: ev.target.checked });
  };
  document.getElementById("usePositions").onchange = function (ev) {
    sendJSON({ type: "set_option", option: "positions",
               value: ev.target.checked });
  };
  document.getElementById("featureBlending").onchange = sendNewCanvas;
  document.getElementById("undo").onclick = undo;
  document.getElementById("redo").onclick = redo;
  window.addEventListener("keydown", function (ev) {
    if (!(ev.ctrlKey || ev.metaKey)) return;
    if (ev.key === "z") { ev.preventDefault(); undo(); }
    if (ev.key === "y") { ev.preventDefault(); redo(); }
  });

  document.querySelectorAll(".brush-grid img").forEach(function (img) {
    img.onclick = function () {
      document.querySelectorAll(".brush-grid img.selected").forEach(
        function (el) { el.classList.remove("selected"); });
      img.classList.add("selected");
      sendJSON({ type: "set_brush", library_id: img.dataset.library,
                 style_id: img.dataset.style });
    };
  });
})();

/* Canvas arc gauge for the reliability scalar.
   Parity with the reference gauge (platform/frontend/js/gauge.js): RAF
   animation with smoothing, color bands >=0.7 green / >=0.3 amber / red,
   threshold ticks at 0.7 and 0.3. */

class ReliabilityGauge {
  constructor(canvas) {
    this.canvas = canvas;
    this.ctx = canvas.getContext("2d");
    this.value = 1.0;
    this.displayed = 1.0;
    this.smoothing = 0.08;
    this._raf = null;
    this.draw();
  }

  set(v) {
    this.value = Math.min(1, Math.max(0, v));
    if (!this._raf) this._animate();
  }

  _animate() {
    this._raf = requestAnimationFrame(() => {
      this.displayed += (this.value - this.displayed) * 0.15;
      this.draw();
      if (Math.abs(this.value - this.displayed) > 0.0005) this._animate();
      else { this.displayed = this.value; this.draw(); this._raf = null; }
    });
  }

  color(v) {
    if (v >= 0.7) return "#2ecc71";
    if (v >= 0.3) return "#f1c40f";
    return "#e74c3c";
  }

  draw() {
    const ctx = this.ctx, w = this.canvas.width, h = this.canvas.height;
    const cx = w / 2, cy = h * 0.78, r = Math.min(w, h * 1.35) * 0.40;
    const a0 = Math.PI * 1.0, a1 = Math.PI * 2.0; // half circle
    ctx.clearRect(0, 0, w, h);

    ctx.lineWidth = 14;
    ctx.lineCap = "round";
    ctx.strokeStyle = "#1d2634";
    ctx.beginPath();
    ctx.arc(cx, cy, r, a0, a1);
    ctx.stroke();

    const v = this.displayed;
    ctx.strokeStyle = this.color(v);
    ctx.beginPath();
    ctx.arc(cx, cy, r, a0, a0 + (a1 - a0) * v);
    ctx.stroke();

    // threshold ticks at 0.7 / 0.3 (trust_engine.py:79-86)
    for (const t of [0.3, 0.7]) {
      const ang = a0 + (a1 - a0) * t;
      ctx.strokeStyle = "#7d8aa0";
      ctx.lineWidth = 2;
      ctx.beginPath();
      ctx.moveTo(cx + Math.cos(ang) * (r - 12), cy + Math.sin(ang) * (r - 12));
      ctx.lineTo(cx + Math.cos(ang) * (r + 12), cy + Math.sin(ang) * (r + 12));
      ctx.stroke();
    }

    ctx.fillStyle = this.color(v);
    ctx.font = "600 30px system-ui";
    ctx.textAlign = "center";
    ctx.fillText(v.toFixed(3), cx, cy - 8);
    ctx.fillStyle = "#7d8aa0";
    ctx.font = "11px system-ui";
    ctx.fillText("RELIABILITY", cx, cy + 14);
  }
}

window.ReliabilityGauge = ReliabilityGauge;

/* Rolling dual-axis time-series chart on raw canvas (no vendored libs).
   Parity with the reference chart (platform/frontend/js/charts.js): 600-point
   window (~20s @ 30Hz), reliability on the left axis [0,1] with threshold
   lines at 0.7/0.3, anomaly on the right axis, view toggle. */

class TrustChart {
  constructor(canvas, windowSize) {
    this.canvas = canvas;
    this.ctx = canvas.getContext("2d");
    this.windowSize = windowSize || 600;
    this.rel = [];
    this.anom = [];
    this.view = "both"; // both | reliability | anomaly
  }

  push(reliability, anomaly) {
    this.rel.push(reliability);
    this.anom.push(anomaly);
    if (this.rel.length > this.windowSize) { this.rel.shift(); this.anom.shift(); }
    this.draw();
  }

  setData(rel, anom) { this.rel = rel.slice(); this.anom = anom.slice(); this.draw(); }
  setView(v) { this.view = v; this.draw(); }
  clear() { this.rel = []; this.anom = []; this.draw(); }

  draw() {
    const ctx = this.ctx;
    const w = this.canvas.width = this.canvas.clientWidth || this.canvas.width;
    const h = this.canvas.height = this.canvas.clientHeight || this.canvas.height;
    const padL = 34, padR = 44, padT = 8, padB = 18;
    const plotW = w - padL - padR, plotH = h - padT - padB;
    ctx.clearRect(0, 0, w, h);

    // grid + reliability thresholds
    ctx.font = "10px system-ui";
    ctx.textAlign = "right";
    for (const g of [0, 0.25, 0.5, 0.75, 1.0]) {
      const y = padT + plotH * (1 - g);
      ctx.strokeStyle = "rgba(255,255,255,0.05)";
      ctx.beginPath(); ctx.moveTo(padL, y); ctx.lineTo(padL + plotW, y); ctx.stroke();
      ctx.fillStyle = "#7d8aa0";
      ctx.fillText(g.toFixed(2), padL - 4, y + 3);
    }
    for (const [t, color] of [[0.7, "#2ecc71"], [0.3, "#e74c3c"]]) {
      const y = padT + plotH * (1 - t);
      ctx.strokeStyle = color; ctx.setLineDash([4, 4]); ctx.globalAlpha = 0.5;
      ctx.beginPath(); ctx.moveTo(padL, y); ctx.lineTo(padL + plotW, y); ctx.stroke();
      ctx.setLineDash([]); ctx.globalAlpha = 1;
    }

    const n = this.rel.length;
    if (n < 2) return;
    const xAt = (i) => padL + (plotW * i) / (this.windowSize - 1 || 1);

    if (this.view !== "anomaly") {
      ctx.strokeStyle = "#3498db"; ctx.lineWidth = 1.8; ctx.beginPath();
      for (let i = 0; i < n; i++) {
        const y = padT + plotH * (1 - this.rel[i]);
        i ? ctx.lineTo(xAt(i), y) : ctx.moveTo(xAt(i), y);
      }
      ctx.stroke();
    }

    if (this.view !== "reliability") {
      const maxA = Math.max(0.1, ...this.anom);
      ctx.strokeStyle = "#9b59b6"; ctx.lineWidth = 1.4; ctx.beginPath();
      for (let i = 0; i < n; i++) {
        const y = padT + plotH * (1 - this.anom[i] / maxA);
        i ? ctx.lineTo(xAt(i), y) : ctx.moveTo(xAt(i), y);
      }
      ctx.stroke();
      ctx.fillStyle = "#9b59b6"; ctx.textAlign = "left";
      ctx.fillText(maxA.toFixed(3), padL + plotW + 4, padT + 8);
      ctx.fillText("anomaly", padL + plotW + 4, padT + 20);
    }
  }
}

window.TrustChart = TrustChart;

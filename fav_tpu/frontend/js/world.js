/* Robot World + first-person synthetic camera renderers.
   Functional parity with the reference's canvas visualizations
   (platform/frontend/js/app.js:289-724 robot world; :419-593,727-864
   synthetic camera): a side-scrolling world whose robot moves at the
   policy-mapped speed (ALLOWED 2.5 / DECLINING 1.2 / DEGRADED 0.5 /
   BLOCKED 0.0 m/s), stops with a red X when blocked; and a perspective
   road view with per-frame noise overlay and frozen/blank/corrupted
   glitch rendering. Both run on their own requestAnimationFrame loop,
   decoupled from the WS tick. */

class RobotWorld {
  constructor(canvas) {
    this.canvas = canvas;
    this.ctx = canvas.getContext("2d");
    this.offset = 0;
    this.wheel = 0;
    this.speed = 2.5;
    this.policy = "VISION_ALLOWED";
    this.particles = [];
    this.lastT = performance.now();
    this.fps = 0;
    this._tick = this._tick.bind(this);
    requestAnimationFrame(this._tick);
  }

  setState(policy, speed) { this.policy = policy; this.speed = speed; }

  _tick(t) {
    const dt = Math.min(0.1, (t - this.lastT) / 1000);
    this.lastT = t;
    this.fps = this.fps * 0.95 + (dt > 0 ? 0.05 / dt : 0);
    this.offset += this.speed * 60 * dt;
    this.wheel += this.speed * 8 * dt;
    this._draw();
    requestAnimationFrame(this._tick);
  }

  _draw() {
    const ctx = this.ctx, w = this.canvas.width, h = this.canvas.height;
    const groundY = h * 0.75;
    ctx.fillStyle = "#0d1320";
    ctx.fillRect(0, 0, w, h);

    // stars
    for (let i = 0; i < 24; i++) {
      const sx = ((i * 127 + 40) % w), sy = (i * 61 + 15) % (groundY * 0.7);
      ctx.fillStyle = "rgba(255,255,255,0.35)";
      ctx.fillRect(sx, sy, 1.6, 1.6);
    }

    // ground
    ctx.fillStyle = "#17202f";
    ctx.fillRect(0, groundY, w, h - groundY);
    ctx.strokeStyle = "#232c3b";
    ctx.beginPath(); ctx.moveTo(0, groundY); ctx.lineTo(w, groundY); ctx.stroke();

    // scrolling ground dashes
    ctx.strokeStyle = "#2c3a50";
    for (let i = -1; i < w / 40 + 1; i++) {
      const x = ((i * 40 - this.offset) % (w + 40) + w + 40) % (w + 40) - 20;
      ctx.beginPath(); ctx.moveTo(x, groundY + 12); ctx.lineTo(x + 18, groundY + 12); ctx.stroke();
    }

    // trees scroll by
    for (let i = 0; i < 5; i++) {
      const x = ((i * 170 - this.offset * 0.8) % (w + 80) + w + 80) % (w + 80) - 40;
      ctx.fillStyle = "#1e2b1e";
      ctx.beginPath();
      ctx.moveTo(x, groundY); ctx.lineTo(x + 14, groundY - 46); ctx.lineTo(x + 28, groundY);
      ctx.fill();
      ctx.fillStyle = "#2b2016";
      ctx.fillRect(x + 12, groundY - 6, 5, 6);
    }

    // robot
    const rx = w * 0.28, ry = groundY;
    ctx.fillStyle = "#3498db";
    ctx.fillRect(rx - 26, ry - 40, 52, 26);           // body
    ctx.fillStyle = "#9fb3cf";
    ctx.fillRect(rx - 8, ry - 54, 16, 14);            // head
    ctx.fillStyle = this.speed > 0 ? "#2ecc71" : "#e74c3c";
    ctx.fillRect(rx - 3, ry - 50, 6, 5);              // eye
    for (const dx of [-15, 15]) {                     // wheels, spokes spin
      ctx.fillStyle = "#111826";
      ctx.beginPath(); ctx.arc(rx + dx, ry - 8, 9, 0, 7); ctx.fill();
      ctx.strokeStyle = "#55657d";
      ctx.beginPath();
      ctx.moveTo(rx + dx - Math.cos(this.wheel) * 7, ry - 8 - Math.sin(this.wheel) * 7);
      ctx.lineTo(rx + dx + Math.cos(this.wheel) * 7, ry - 8 + Math.sin(this.wheel) * 7);
      ctx.stroke();
    }

    // dust particles while moving
    if (this.speed > 0.1 && Math.random() < 0.5) {
      this.particles.push({ x: rx - 28, y: ry - 4, vx: -30 - Math.random() * 40, vy: -Math.random() * 18, life: 1 });
    }
    this.particles = this.particles.filter((p) => p.life > 0);
    for (const p of this.particles) {
      p.x += p.vx / 60; p.y += p.vy / 60; p.vy += 1.2; p.life -= 0.04;
      ctx.fillStyle = `rgba(125,138,160,${p.life * 0.5})`;
      ctx.fillRect(p.x, p.y, 2, 2);
    }

    // blocked: stop rock + red X
    if (this.policy === "VISION_BLOCKED") {
      ctx.fillStyle = "#3d2f2f";
      ctx.beginPath();
      ctx.moveTo(rx + 70, groundY); ctx.lineTo(rx + 90, groundY - 26); ctx.lineTo(rx + 115, groundY);
      ctx.fill();
      ctx.strokeStyle = "#e74c3c"; ctx.lineWidth = 4;
      ctx.beginPath();
      ctx.moveTo(rx + 78, groundY - 38); ctx.lineTo(rx + 104, groundY - 14);
      ctx.moveTo(rx + 104, groundY - 38); ctx.lineTo(rx + 78, groundY - 14);
      ctx.stroke(); ctx.lineWidth = 1;
    }

    // HUD: speed + fps (reference app.js:715-723)
    ctx.fillStyle = "#7d8aa0"; ctx.font = "11px system-ui"; ctx.textAlign = "left";
    ctx.fillText(`${this.speed.toFixed(1)} m/s   ${this.fps.toFixed(0)} fps`, 8, 14);
  }
}

class SyntheticCamera {
  constructor(canvas) {
    this.canvas = canvas;
    this.ctx = canvas.getContext("2d");
    this.mode = "normal";
    this.noise = 0.0;
    this.brightness = 0.5;
    this.speed = 2.5;
    this.offset = 0;
    this.frozenFrame = null;
    this.lastT = performance.now();
    this._tick = this._tick.bind(this);
    requestAnimationFrame(this._tick);
  }

  setState(mode, noise, brightness, speed) {
    if (mode !== "frozen") this.frozenFrame = null;
    this.mode = mode; this.noise = noise; this.brightness = brightness; this.speed = speed;
  }

  _tick(t) {
    const dt = Math.min(0.1, (t - this.lastT) / 1000);
    this.lastT = t;
    this.offset += this.speed * dt * 3;
    this._draw();
    requestAnimationFrame(this._tick);
  }

  _draw() {
    const ctx = this.ctx, w = this.canvas.width, h = this.canvas.height;

    if (this.mode === "blank") {               // camera dead: black + static tint
      ctx.fillStyle = "#020202"; ctx.fillRect(0, 0, w, h);
      ctx.fillStyle = "#e74c3c"; ctx.font = "12px system-ui"; ctx.textAlign = "center";
      ctx.fillText("NO SIGNAL", w / 2, h / 2);
      return;
    }
    if (this.mode === "frozen" && this.frozenFrame) {  // hold last frame
      ctx.putImageData(this.frozenFrame, 0, 0);
      ctx.fillStyle = "rgba(120,180,255,0.10)";
      ctx.fillRect(0, 0, w, h);
      ctx.fillStyle = "#9ecbff"; ctx.font = "12px system-ui"; ctx.textAlign = "center";
      ctx.fillText("FROZEN", w / 2, 18);
      return;
    }

    // perspective road scene
    const horizon = h * 0.45;
    const bright = 0.4 + this.brightness * 1.2;
    ctx.fillStyle = `rgb(${20 * bright | 0},${28 * bright | 0},${46 * bright | 0})`;
    ctx.fillRect(0, 0, w, horizon);
    ctx.fillStyle = `rgb(${30 * bright | 0},${38 * bright | 0},${52 * bright | 0})`;
    ctx.fillRect(0, horizon, w, h - horizon);

    // road trapezoid
    ctx.fillStyle = `rgb(${44 * bright | 0},${52 * bright | 0},${66 * bright | 0})`;
    ctx.beginPath();
    ctx.moveTo(w * 0.44, horizon); ctx.lineTo(w * 0.56, horizon);
    ctx.lineTo(w * 0.85, h); ctx.lineTo(w * 0.15, h);
    ctx.fill();

    // moving center-line dashes (perspective spacing)
    ctx.strokeStyle = `rgba(241,196,15,${0.65 * bright})`;
    ctx.lineWidth = 2;
    for (let i = 0; i < 7; i++) {
      const p = ((i / 7 + (this.offset % 1)) % 1);
      const y0 = horizon + p * p * (h - horizon);
      const y1 = horizon + Math.min(1, p + 0.045) ** 2 * (h - horizon);
      ctx.beginPath(); ctx.moveTo(w / 2, y0); ctx.lineTo(w / 2, y1); ctx.stroke();
    }

    // per-pixel noise overlay (reference draws gaussian noise per pixel)
    if (this.noise > 0.01 || this.mode === "corrupted") {
      const amount = this.mode === "corrupted" ? 0.9 : this.noise;
      const img = ctx.getImageData(0, 0, w, h);
      const d = img.data;
      const step = amount > 0.5 ? 4 : 8;  // denser sampling at high noise
      for (let i = 0; i < d.length; i += 4 * step) {
        const n = (Math.random() - 0.5) * 255 * amount;
        d[i] += n; d[i + 1] += n; d[i + 2] += n;
      }
      ctx.putImageData(img, 0, 0);
    }
    if (this.mode === "corrupted") {           // glitch bars + channel tear
      for (let i = 0; i < 6; i++) {
        const y = Math.random() * h, bh = 2 + Math.random() * 8;
        ctx.fillStyle = `rgba(${Math.random() * 255 | 0},${Math.random() * 64 | 0},${Math.random() * 255 | 0},0.35)`;
        ctx.fillRect(0, y, w, bh);
      }
    }
    if (this.mode === "frozen" && !this.frozenFrame) {
      this.frozenFrame = ctx.getImageData(0, 0, w, h);
    }
  }
}

window.RobotWorld = RobotWorld;
window.SyntheticCamera = SyntheticCamera;

/* Ambient animated background — decorative only, no data-path role.
   (Role parity: the reference ships a Three.js floating-lines background and
   particle effects, platform/frontend/js/floating-lines.js / particles.js;
   this is a dependency-free 2D-canvas equivalent: slow drifting bezier
   lines + sparse particles behind the content.) */

(() => {
  const canvas = document.createElement("canvas");
  canvas.style.cssText =
    "position:fixed;inset:0;z-index:-1;pointer-events:none;opacity:0.5;";
  document.body.prepend(canvas);
  const ctx = canvas.getContext("2d");

  const lines = [...Array(7)].map((_, i) => ({
    y: 0.1 + 0.8 * Math.random(),
    amp: 30 + Math.random() * 70,
    speed: 0.05 + Math.random() * 0.15,
    phase: Math.random() * Math.PI * 2,
    hue: [210, 260, 280][i % 3],
  }));
  const dots = [...Array(40)].map(() => ({
    x: Math.random(), y: Math.random(),
    vx: (Math.random() - 0.5) * 0.01, vy: (Math.random() - 0.5) * 0.01,
  }));

  function frame(t) {
    const w = (canvas.width = innerWidth);
    const h = (canvas.height = innerHeight);
    ctx.clearRect(0, 0, w, h);

    for (const line of lines) {
      ctx.strokeStyle = `hsla(${line.hue},55%,55%,0.10)`;
      ctx.lineWidth = 1.2;
      ctx.beginPath();
      for (let x = 0; x <= w; x += 16) {
        const y =
          line.y * h +
          Math.sin(x / 240 + t / 1000 * line.speed * 6 + line.phase) * line.amp +
          Math.sin(x / 90 - t / 1000 * line.speed * 3) * line.amp * 0.3;
        x === 0 ? ctx.moveTo(x, y) : ctx.lineTo(x, y);
      }
      ctx.stroke();
    }

    ctx.fillStyle = "rgba(160,190,230,0.25)";
    for (const d of dots) {
      d.x = (d.x + d.vx / 60 + 1) % 1;
      d.y = (d.y + d.vy / 60 + 1) % 1;
      ctx.fillRect(d.x * w, d.y * h, 1.6, 1.6);
    }
    requestAnimationFrame(frame);
  }
  requestAnimationFrame(frame);
})();

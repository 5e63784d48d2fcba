/* Ambient animated background — decorative only, no data-path role.
   (Role parity: the reference ships a Three.js floating-lines background
   with mouse-interactive bending and parallax plus particle effects,
   platform/frontend/js/floating-lines.js / particles.js; this is a
   dependency-free 2D-canvas equivalent: three wave groups of gradient
   bezier lines that bend away from the pointer with damped easing,
   drift with scroll parallax, plus sparse particles.)

   Behavior notes:
   - devicePixelRatio-aware backing store (crisp on hiDPI, capped at 2x);
   - pauses the RAF loop while the tab is hidden (no background CPU);
   - honors prefers-reduced-motion: renders one static frame, no loop;
   - pointer influence eases in/out with damping ~0.06 per frame. */

(() => {
  "use strict";

  const canvas = document.createElement("canvas");
  canvas.style.cssText =
    "position:fixed;inset:0;z-index:-1;pointer-events:none;opacity:0.55;";
  document.body.prepend(canvas);
  const ctx = canvas.getContext("2d");

  const reduced = matchMedia("(prefers-reduced-motion: reduce)").matches;

  // three wave groups (top / middle / bottom), each a band of lines
  const GROUPS = [
    { yc: 0.18, tilt: -0.06, hueA: 210, hueB: 190, n: 5, amp: 46, speed: 0.10 },
    { yc: 0.52, tilt: 0.03, hueA: 260, hueB: 220, n: 6, amp: 64, speed: 0.07 },
    { yc: 0.84, tilt: 0.06, hueA: 285, hueB: 250, n: 5, amp: 52, speed: 0.12 },
  ].map((g) => ({
    ...g,
    lines: [...Array(g.n)].map((_, i) => ({
      off: (i - (g.n - 1) / 2) * 14,
      phase: Math.random() * Math.PI * 2,
      wl: 200 + Math.random() * 120,
      alpha: 0.055 + 0.05 * (1 - Math.abs(i - (g.n - 1) / 2) / g.n),
    })),
  }));

  const dots = [...Array(36)].map(() => ({
    x: Math.random(), y: Math.random(),
    vx: (Math.random() - 0.5) * 0.012, vy: (Math.random() - 0.5) * 0.012,
    r: 1.1 + Math.random() * 1.1,
  }));

  // pointer state with damped easing (bend lines away from the cursor)
  const mouse = { x: -1e4, y: -1e4, cx: -1e4, cy: -1e4, inf: 0, cinf: 0 };
  const BEND_R = 180, BEND_STRENGTH = 34, DAMP = 0.06;
  addEventListener("pointermove", (e) => {
    mouse.x = e.clientX; mouse.y = e.clientY; mouse.inf = 1;
  }, { passive: true });
  addEventListener("pointerleave", () => { mouse.inf = 0; }, { passive: true });

  let scrollPar = 0; // parallax offset, eased
  let raf = null;

  function size() {
    const dpr = Math.min(devicePixelRatio || 1, 2);
    canvas.width = Math.round(innerWidth * dpr);
    canvas.height = Math.round(innerHeight * dpr);
    ctx.setTransform(dpr, 0, 0, dpr, 0, 0);
  }

  function drawFrame(t) {
    const w = innerWidth, h = innerHeight;
    ctx.clearRect(0, 0, w, h);

    // damped pointer + parallax easing
    mouse.cx += (mouse.x - mouse.cx) * DAMP;
    mouse.cy += (mouse.y - mouse.cy) * DAMP;
    mouse.cinf += (mouse.inf - mouse.cinf) * DAMP;
    const target = (scrollY || 0) * 0.12;
    scrollPar += (target - scrollPar) * 0.08;

    for (const g of GROUPS) {
      const baseY = g.yc * h - scrollPar * (g.yc + 0.4);
      const grad = ctx.createLinearGradient(0, 0, w, 0);
      grad.addColorStop(0, `hsla(${g.hueA},60%,58%,1)`);
      grad.addColorStop(1, `hsla(${g.hueB},70%,62%,1)`);
      ctx.strokeStyle = grad;

      for (const ln of g.lines) {
        ctx.globalAlpha = ln.alpha;
        ctx.lineWidth = 1.2;
        ctx.beginPath();
        for (let x = -20; x <= w + 20; x += 14) {
          let y = baseY + ln.off + (x - w / 2) * g.tilt +
            Math.sin(x / ln.wl + (t / 1000) * g.speed * 6 + ln.phase) * g.amp +
            Math.sin(x / (ln.wl * 0.37) - (t / 1000) * g.speed * 2.6) * g.amp * 0.3;
          // bend away from the pointer (damped influence)
          if (mouse.cinf > 0.01) {
            const dx = x - mouse.cx, dy = y - mouse.cy;
            const d2 = dx * dx + dy * dy;
            if (d2 < BEND_R * BEND_R) {
              const f = 1 - Math.sqrt(d2) / BEND_R;
              y += Math.sign(dy || 1) * f * f * BEND_STRENGTH * mouse.cinf;
            }
          }
          x <= -20 ? ctx.moveTo(x, y) : ctx.lineTo(x, y);
        }
        ctx.stroke();
      }
    }

    ctx.globalAlpha = 1;
    ctx.fillStyle = "rgba(160,190,230,0.25)";
    for (const d of dots) {
      d.x = (d.x + d.vx / 60 + 1) % 1;
      d.y = (d.y + d.vy / 60 + 1) % 1;
      ctx.beginPath();
      ctx.arc(d.x * w, d.y * h, d.r, 0, 7);
      ctx.fill();
    }
  }

  function loop(t) {
    drawFrame(t);
    raf = requestAnimationFrame(loop);
  }

  size();
  addEventListener("resize", () => { size(); if (reduced) drawFrame(0); });

  if (reduced) {
    drawFrame(0); // one static frame, no animation
    return;
  }

  document.addEventListener("visibilitychange", () => {
    if (document.hidden) {
      if (raf) cancelAnimationFrame(raf), (raf = null);
    } else if (!raf) {
      raf = requestAnimationFrame(loop);
    }
  });
  raf = requestAnimationFrame(loop);
})();

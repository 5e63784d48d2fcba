/* ScrollStack — scroll-pinned stacking cards, decorative only.
   (Role parity: the reference's architecture page stacks its pipeline
   cards with a Lenis-driven ScrollStack component,
   platform/frontend/js/scroll-stack.js; this is a dependency-free
   equivalent driven by the native scroll event + rAF throttling.)

   Each `.arch-card` pins near the top of the viewport as it scrolls up
   and settles slightly scaled-down beneath the cards that follow, so
   the pipeline reads as a deck being dealt. Pure transforms — layout
   is never mutated, so the page works identically with JS disabled.

   - honors prefers-reduced-motion (installs nothing);
   - pin math uses natural (untransformed) positions: translateY moves
     getBoundingClientRect, so rects are corrected by the transform we
     applied last frame to avoid a feedback loop;
   - writes transforms only when they change (no layout thrash). */

(() => {
  "use strict";

  if (matchMedia("(prefers-reduced-motion: reduce)").matches) return;

  const PIN_TOP = 86;       // px from viewport top where cards pin
  const STACK_GAP = 22;     // vertical offset between stacked card tops
  const SCALE_STEP = 0.025; // scale lost per unit of burial depth
  const BASE_SCALE = 0.88;  // floor for the deepest card

  const cards = [...document.querySelectorAll(".arch-card")];
  if (cards.length < 2) return;

  const applied = new Map(); // card -> {py, tf} applied last frame
  for (const c of cards) applied.set(c, { py: 0, tf: "" });
  let ticking = false;

  // natural viewport top = transformed rect corrected by our own translate
  // (scale keeps the top edge fixed: transform-origin is top center)
  const naturalTop = (card) =>
    card.getBoundingClientRect().top - applied.get(card).py;

  function update() {
    ticking = false;
    const n = cards.length;
    const span = Math.max(1, innerHeight - PIN_TOP);
    cards.forEach((card, i) => {
      const pinAt = PIN_TOP + i * STACK_GAP;
      const past = Math.max(0, pinAt - naturalTop(card));
      let py = 0, tf = "";
      if (past > 0 && i < n - 1) {
        py = past;
        // burial depth ramps as the next card approaches its own pin
        const nextGap = naturalTop(cards[i + 1]) - (pinAt + STACK_GAP);
        const depth = Math.min(1, Math.max(0, 1 - nextGap / span));
        const scale = Math.max(BASE_SCALE, 1 - depth * SCALE_STEP * (n - i));
        tf = `translateY(${py.toFixed(1)}px) scale(${scale.toFixed(4)})`;
      }
      const prev = applied.get(card);
      if (prev.tf !== tf) {
        card.style.transform = tf;
        applied.set(card, { py, tf });
      }
    });
  }

  function onScroll() {
    if (!ticking) {
      ticking = true;
      requestAnimationFrame(update);
    }
  }

  addEventListener("scroll", onScroll, { passive: true });
  addEventListener("resize", onScroll, { passive: true });
  update();
})();

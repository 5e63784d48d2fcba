/* ML Playground — batch sequence simulation client.
   Contract parity with the reference playground (platform/frontend/js/playground.js):
   preset sequences (normal_stable / gradual_decay / freeze_recovery /
   full_cycle, playground.js:235-273), /ws/playground batch submission, result
   charts + summary stats, and client-side uploaded-video analysis
   (seek-sample <=300 frames at 1-in-10, 128x128 downsample, rule
   classification, run-length encoding, playground.js:296-388,435-506). */

(() => {
  const $ = (id) => document.getElementById(id);
  const chart = new TrustChart($("pg-chart"), 1200);
  let lastResults = null;

  // ── preset sequences (playground.js:235-273) ──
  const SEQUENCES = {
    normal_stable: [
      { status: "VISION_OK", noise: 0.0, brightness: 0.5, frames: 300 },
    ],
    gradual_decay: [
      { status: "VISION_OK", noise: 0.0, brightness: 0.5, frames: 60 },
      { status: "VISION_OK", noise: 0.3, brightness: 0.5, frames: 60 },
      { status: "VISION_OK", noise: 0.6, brightness: 0.5, frames: 60 },
      { status: "VISION_OK", noise: 0.9, brightness: 0.5, frames: 60 },
      { status: "VISION_CORRUPTED", noise: 1.0, brightness: 0.5, frames: 60 },
    ],
    freeze_recovery: [
      { status: "VISION_OK", noise: 0.0, brightness: 0.5, frames: 90 },
      { status: "VISION_FROZEN", noise: 0.0, brightness: 0.5, frames: 120 },
      { status: "VISION_OK", noise: 0.0, brightness: 0.5, frames: 240 },
    ],
    full_cycle: [
      { status: "VISION_OK", noise: 0.0, brightness: 0.5, frames: 60 },
      { status: "VISION_FROZEN", noise: 0.0, brightness: 0.5, frames: 60 },
      { status: "VISION_OK", noise: 0.0, brightness: 0.5, frames: 60 },
      { status: "VISION_BLANK", noise: 0.0, brightness: 0.5, frames: 60 },
      { status: "VISION_OK", noise: 0.0, brightness: 0.5, frames: 60 },
      { status: "VISION_CORRUPTED", noise: 0.8, brightness: 0.5, frames: 60 },
      { status: "VISION_OK", noise: 0.0, brightness: 0.5, frames: 180 },
    ],
  };

  const ws = new TrustWebSocket("/ws/playground", {
    onOpen: () => $("pg-conn").classList.add("connected"),
    onClose: () => $("pg-conn").classList.remove("connected"),
    onMessage: (msg) => {
      if (msg.type === "simulation_result") renderResults(msg.results);
      else if (msg.type === "error") setStatus(msg.message);
    },
  });

  function setStatus(text) { $("pg-status").textContent = text; }

  function simulate(events, label) {
    setStatus(`Simulating ${label} (${events.reduce((a, e) => a + e.frames, 0)} ticks)…`);
    ws.send({ action: "simulate_sequence", events });
  }

  document.querySelectorAll("[data-seq]").forEach((btn) => {
    btn.onclick = () => {
      document.querySelectorAll("[data-seq]").forEach((b) => b.classList.remove("active"));
      btn.classList.add("active");
      simulate(SEQUENCES[btn.dataset.seq], btn.dataset.seq);
    };
  });

  // ── raw-vs-reconstruction animation (parity surface: the reference's
  // simulated AE frame comparison, playground.js:160-232). Replays the
  // result timeline: the raw pane renders the status-appropriate synthetic
  // frame; the recon pane shows what an AE trained on normal data would
  // produce (smooth scene for OK/frozen/blank — the blind spot — and a
  // clean-but-wrong scene for corrupted). ──
  let reconTimer = null;
  function animateRecon(results) {
    if (reconTimer) clearInterval(reconTimer);
    const raw = $("pg-raw").getContext("2d");
    const rec = $("pg-recon").getContext("2d");
    let i = 0;
    reconTimer = setInterval(() => {
      if (i >= results.length) { clearInterval(reconTimer); reconTimer = null; return; }
      const r = results[Math.min(i, results.length - 1)];
      drawScene(raw, r.vision_status, r.anomaly_score, true);
      drawScene(rec, r.vision_status, r.anomaly_score, false);
      $("pg-recon-err").textContent = Number(r.anomaly_score).toFixed(4);
      i += 4;  // ~8x real time
    }, 33);
  }

  function drawScene(ctx, status, anomaly, isRaw) {
    const w = 160, h = 120;
    // base scene: sky + ground + box obstacle (what the AE was trained on)
    ctx.fillStyle = "#1c2940"; ctx.fillRect(0, 0, w, h * 0.55);
    ctx.fillStyle = "#22303f"; ctx.fillRect(0, h * 0.55, w, h * 0.45);
    ctx.fillStyle = "#3b5068"; ctx.fillRect(w * 0.4, h * 0.38, 34, 28);
    if (!isRaw) return;                       // reconstruction is always smooth
    if (status === "VISION_BLANK") {          // raw: dead feed
      ctx.fillStyle = "#000"; ctx.fillRect(0, 0, w, h);
      return;
    }
    if (status === "VISION_FROZEN") {         // raw: tinted stale frame
      ctx.fillStyle = "rgba(140,190,255,0.14)"; ctx.fillRect(0, 0, w, h);
      return;
    }
    if (status === "VISION_CORRUPTED" || anomaly > 0.1) {
      const img = ctx.getImageData(0, 0, w, h), d = img.data;
      const amt = status === "VISION_CORRUPTED" ? 200 : anomaly * 300;
      for (let p = 0; p < d.length; p += 8) {
        const n = (Math.random() - 0.5) * amt;
        d[p] += n; d[p + 1] += n; d[p + 2] += n;
      }
      ctx.putImageData(img, 0, 0);
    }
  }

  function renderResults(results) {
    lastResults = results;
    animateRecon(results);
    setStatus(`Done — ${results.length} ticks (dt = 1/30 s, one compiled lax.scan on device).`);
    chart.setData(results.map((r) => r.reliability), results.map((r) => r.anomaly_score));

    // summary stats (playground.js:121-157)
    let policyChanges = 0, blockedTicks = 0, minRel = 1.0, conflicts = 0;
    for (let i = 0; i < results.length; i++) {
      if (i > 0 && results[i].policy_state !== results[i - 1].policy_state) policyChanges++;
      if (results[i].policy_state === "VISION_BLOCKED") blockedTicks++;
      minRel = Math.min(minRel, results[i].reliability);
      conflicts = Math.max(conflicts, results[i].contradiction_count);
    }
    $("pg-changes").textContent = policyChanges;
    $("pg-blocked").textContent = (blockedTicks / 30).toFixed(1) + " s";
    $("pg-minrel").textContent = minRel.toFixed(4);
    $("pg-conflicts").textContent = conflicts;
    $("pg-final").textContent = results.length
      ? results[results.length - 1].policy_state : "—";
  }

  $("pg-export").onclick = () => {
    if (!lastResults) return;
    const header = Object.keys(lastResults[0]);
    const csv = [header.join(",")]
      .concat(lastResults.map((r) => header.map((k) => r[k]).join(",")))
      .join("\n");
    const a = document.createElement("a");
    a.href = URL.createObjectURL(new Blob([csv], { type: "text/csv" }));
    a.download = "playground_result.csv";
    a.click();
    URL.revokeObjectURL(a.href);
  };

  // ── client-side video analysis (playground.js:296-388,435-506) ──
  const zone = $("pg-upload");
  zone.onclick = () => $("pg-file").click();
  zone.ondragover = (e) => { e.preventDefault(); zone.classList.add("drag"); };
  zone.ondragleave = () => zone.classList.remove("drag");
  zone.ondrop = (e) => {
    e.preventDefault();
    zone.classList.remove("drag");
    if (e.dataTransfer.files[0]) analyzeVideo(e.dataTransfer.files[0]);
  };
  $("pg-file").onchange = (e) => { if (e.target.files[0]) analyzeVideo(e.target.files[0]); };

  async function analyzeVideo(file) {
    setStatus(`Analyzing ${file.name} client-side…`);
    const video = document.createElement("video");
    video.src = URL.createObjectURL(file);
    video.muted = true;
    await new Promise((res, rej) => { video.onloadedmetadata = res; video.onerror = rej; });

    const fps = 30;
    const totalFrames = Math.floor(video.duration * fps);
    const step = 10;                                     // 1-in-10 frames
    const samples = Math.min(300, Math.floor(totalFrames / step));
    const canvas = document.createElement("canvas");
    canvas.width = 128; canvas.height = 128;             // 128x128 downsample
    const ctx = canvas.getContext("2d", { willReadFrequently: true });

    let prev = null;
    const classes = [];
    for (let i = 0; i < samples; i++) {
      video.currentTime = (i * step) / fps;
      await new Promise((res) => { video.onseeked = res; });
      ctx.drawImage(video, 0, 0, 128, 128);
      const data = ctx.getImageData(0, 0, 128, 128).data;
      classes.push(classify(data, prev));
      prev = data.slice();
    }
    URL.revokeObjectURL(video.src);

    // run-length encode to events, x step frames each (playground.js:354-388)
    const events = [];
    for (const c of classes) {
      const last = events[events.length - 1];
      if (last && last.status === c) last.frames += step;
      else events.push({ status: c, noise: 0.0, brightness: 0.5, frames: step });
    }
    simulate(events, file.name);
  }

  function classify(data, prev) {
    // rule thresholds per the reference client analyzer (playground.js:296-344)
    let sum = 0, sumSq = 0, diff = 0;
    const n = data.length / 4;
    for (let i = 0; i < data.length; i += 4) {
      const gray = 0.299 * data[i] + 0.587 * data[i + 1] + 0.114 * data[i + 2];
      sum += gray; sumSq += gray * gray;
      if (prev) {
        const pg = 0.299 * prev[i] + 0.587 * prev[i + 1] + 0.114 * prev[i + 2];
        diff += Math.abs(gray - pg);
      }
    }
    const mean = sum / n;
    const std = Math.sqrt(Math.max(0, sumSq / n - mean * mean));
    if (mean < 20) return "VISION_BLANK";
    if (prev && diff / n < 3.0) return "VISION_FROZEN";
    if (std > 80) return "VISION_CORRUPTED";
    return "VISION_OK";
  }
})();

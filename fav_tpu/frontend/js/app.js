/* Dashboard orchestration.
   Contract parity with the reference app (platform/frontend/js/app.js):
   consumes the /ws state stream (reliability, policy_state, vision_status,
   anomaly_*, trust_velocity, recovery_debt/coeff, contradiction_*,
   failure_events, video_frame, signal_metrics), sends the control actions
   (set_vision, set_noise, set_brightness, reset, get_log, set_source_mode,
   set_tick_rate), and runs the 5 preset scenarios (app.js:1119-1163). */

(() => {
  const $ = (id) => document.getElementById(id);

  const gauge = new ReliabilityGauge($("gauge"));
  const chart = new TrustChart($("chart"), 600);
  const world = new RobotWorld($("world"));
  const synthCam = new SyntheticCamera($("synth-cam"));
  let tick = 0;
  let scenarioTimer = null;

  // ── policy -> robot speed map (app.js:42-47) ──
  const POLICY_SPEED = {
    VISION_ALLOWED: 2.5,
    VISION_DECLINING: 1.2,
    VISION_DEGRADED: 0.5,
    VISION_BLOCKED: 0.0,
  };

  function fmt(v, d) { return v === undefined || v === null ? "—" : Number(v).toFixed(d); }

  function onState(msg) {
    if (msg.type === "log_data") return downloadLogs(msg);
    if (msg.type === "mode_changed") return setSourceButtons(msg.mode);
    if (msg.type === "error") return showError(msg.message);
    if (msg.reliability === undefined) return;

    gauge.set(msg.reliability);
    tick += 1;
    if (tick % 3 === 0) chart.push(msg.reliability, msg.anomaly_score || 0); // throttle (app.js:161-163)

    const banner = $("policy");
    banner.textContent = msg.policy_state;
    banner.className = "policy-banner policy-" + msg.policy_state;

    $("m-status").textContent = msg.vision_status || "—";
    $("m-anomaly").textContent = fmt(msg.anomaly_score, 4);
    $("m-integral").textContent = fmt(msg.anomaly_integral, 4);
    $("m-velocity").textContent = fmt(msg.trust_velocity, 3);
    $("m-debt").textContent = fmt(msg.recovery_debt, 3);
    $("m-coeff").textContent = fmt(msg.recovery_coeff, 4);
    $("m-conflicts").textContent = msg.contradiction_count ?? 0;
    $("m-speed").textContent = fmt(POLICY_SPEED[msg.policy_state] ?? 0, 1) + " m/s";
    $("m-ml").textContent = msg.ml_influence_active ? "ACTIVE" : "inactive";
    $("m-ticks").textContent = msg.tick_count ?? 0;

    // canvas renderers follow the latest state on their own RAF loop
    const speed = POLICY_SPEED[msg.policy_state] ?? 0;
    world.setState(msg.policy_state, speed);
    const isSim = msg.source_mode === "simulation";
    $("synth-cam").style.display = isSim ? "block" : "none";
    $("camera-img").style.display = isSim ? "none" : $("camera-img").style.display;
    if (isSim && msg.frame) {
      synthCam.setState(msg.frame.mode, msg.frame.noise_level, msg.frame.brightness, speed);
    }
    if (msg.video_frame) {
      const img = $("camera-img");
      img.src = "data:image/jpeg;base64," + msg.video_frame;
      img.style.display = "block";
    }
    if (msg.analysis_warming) {
      $("m-status").textContent = "warming up…";
    }
    if (msg.tick_error) {
      showError("tick error: " + msg.tick_error);
    }
    if (msg.signal_metrics) {
      $("sig-panel").style.display = "block";
      $("sig-blur").textContent = fmt(msg.signal_metrics.blur, 3);
      $("sig-brightness").textContent = fmt(msg.signal_metrics.brightness, 3);
      $("sig-freeze").textContent = fmt(msg.signal_metrics.freeze, 3);
      $("sig-entropy").textContent = fmt(msg.signal_metrics.entropy, 3);
    }
    if (msg.ml_inference) {
      $("ml-panel").style.display = "block";
      // degraded-predictor badge: the server stamps model_degraded on every
      // tick while serving untrained weights (restore failure / missing
      // checkpoint) — the ML numbers render, but flagged as not-real-ML
      var degEl = $("ml-degraded");
      if (degEl) {
        degEl.style.display = msg.model_degraded ? "block" : "none";
      }
      $("ml-pred").textContent = msg.ml_inference.prediction;
      $("ml-conf").textContent = fmt(msg.ml_inference.confidence, 3);
      $("ml-anom").textContent = fmt(msg.ml_inference.model_anomaly, 3);
      // conformal prediction-set size: present only when the served
      // checkpoint carries a calibrated qhat (1 = certified singleton)
      var setEl = $("ml-set");
      if (setEl) {
        setEl.textContent = msg.ml_inference.conformal_set_size !== undefined
          ? String(msg.ml_inference.conformal_set_size) : "—";
      }
      // epistemic disagreement (BALD MI): only multi-forward serving modes
      // (ensemble / mc_dropout) have a member axis to disagree over
      var miEl = $("ml-mi");
      if (miEl) {
        miEl.textContent = msg.ml_inference.mutual_information !== undefined
          ? fmt(msg.ml_inference.mutual_information, 3) : "—";
      }
      // feature-space OOD distance (normalized relative Mahalanobis):
      // present when the served checkpoint ships a maha_fit.npz
      var fdEl = $("ml-fdist");
      if (fdEl) {
        fdEl.textContent = msg.ml_inference.feature_distance !== undefined
          ? fmt(msg.ml_inference.feature_distance, 3) : "—";
      }
    }
    renderEvents(msg.failure_events);
  }

  function renderEvents(summary) {
    if (!summary) return;
    $("ev-total").textContent = summary.total_excursions ?? 0;
    $("ev-recovery").textContent = summary.mean_recovery_s !== undefined
      ? summary.mean_recovery_s + " s" : "—";
    $("ev-worst").textContent = summary.worst_reliability !== undefined
      ? summary.worst_reliability : "—";
    const causes = summary.by_cause || {};
    $("ev-causes").textContent =
      Object.keys(causes).map((c) => `${c}:${causes[c]}`).join("  ") || "—";
  }

  function downloadLogs(msg) {
    for (const [name, text] of [["session_log.csv", msg.csv], ["failure_events.csv", msg.events_csv]]) {
      if (!text) continue;
      const a = document.createElement("a");
      a.href = URL.createObjectURL(new Blob([text], { type: "text/csv" }));
      a.download = name;
      a.click();
      URL.revokeObjectURL(a.href);
    }
  }

  function showError(message) {
    const el = $("error-bar");
    el.textContent = message;
    el.style.display = "block";
    setTimeout(() => { el.style.display = "none"; }, 5000);
  }

  // ── websocket ──
  const ws = new TrustWebSocket("/ws", {
    onOpen: () => $("conn").classList.add("connected"),
    onClose: () => $("conn").classList.remove("connected"),
    onMessage: onState,
  });

  // ── controls ──
  function setActive(groupSel, btn) {
    document.querySelectorAll(groupSel).forEach((b) => b.classList.remove("active"));
    if (btn) btn.classList.add("active");
  }

  document.querySelectorAll("[data-vision]").forEach((btn) => {
    btn.onclick = () => {
      ws.send({ action: "set_vision", mode: btn.dataset.vision });
      setActive("[data-vision]", btn);
    };
  });

  document.querySelectorAll("[data-source]").forEach((btn) => {
    btn.onclick = () => {
      const mode = btn.dataset.source;
      if (mode === "video") {
        $("video-file").click(); // upload first, then switch
        return;
      }
      ws.send({ action: "set_source_mode", mode });
    };
  });

  function setSourceButtons(mode) {
    setActive("[data-source]", document.querySelector(`[data-source="${mode}"]`));
  }

  $("video-file").onchange = async (ev) => {
    const file = ev.target.files[0];
    if (!file) return;
    const form = new FormData();
    form.append("file", file);
    const res = await fetch("/api/upload-video", { method: "POST", body: form });
    const out = await res.json();
    if (out.filepath) ws.send({ action: "set_source_mode", mode: "video", filepath: out.filepath });
    else showError(out.error || "upload failed");
  };

  $("noise").oninput = (ev) => {
    const v = Number(ev.target.value) / 100;
    $("noise-val").textContent = v.toFixed(2);
    ws.send({ action: "set_noise", level: v });
  };
  $("brightness").oninput = (ev) => {
    const v = Number(ev.target.value) / 100;
    $("brightness-val").textContent = v.toFixed(2);
    ws.send({ action: "set_brightness", level: v });
  };
  $("tick-rate").oninput = (ev) => {
    const v = Number(ev.target.value);
    $("tick-val").textContent = v + " Hz";
    ws.send({ action: "set_tick_rate", rate: v });
  };

  $("btn-reset").onclick = () => {
    stopScenario();
    ws.send({ action: "reset" });
    chart.clear();
    $("noise").value = 0; $("noise-val").textContent = "0.00";
    $("brightness").value = 50; $("brightness-val").textContent = "0.50";
    setActive("[data-vision]", document.querySelector('[data-vision="normal"]'));
  };
  $("btn-log").onclick = () => ws.send({ action: "get_log" });

  document.querySelectorAll("[data-view]").forEach((btn) => {
    btn.onclick = () => { chart.setView(btn.dataset.view); setActive("[data-view]", btn); };
  });

  // ── preset scenarios (app.js:1119-1163) ──
  const SCENARIOS = {
    normal: [{ t: 0, a: () => vision("normal") }],
    freeze: [
      { t: 0, a: () => vision("normal") },
      { t: 2000, a: () => vision("frozen") },
      { t: 8000, a: () => vision("normal") },
    ],
    degrade: [
      { t: 0, a: () => vision("normal") },
      ...[...Array(10).keys()].map((i) => ({ t: 1000 + i * 800, a: () => noise((i + 1) / 10) })),
      { t: 10000, a: () => vision("corrupted") },
      { t: 15000, a: () => { vision("normal"); noise(0); } },
    ],
    recovery: [
      { t: 0, a: () => vision("blank") },
      { t: 5000, a: () => vision("normal") },
    ],
    ml_stress: [
      { t: 0, a: () => vision("normal") },
      { t: 1000, a: () => noise(0.8) },
      { t: 10000, a: () => noise(0) },
    ],
  };
  function vision(mode) {
    ws.send({ action: "set_vision", mode });
    setActive("[data-vision]", document.querySelector(`[data-vision="${mode}"]`));
  }
  function noise(v) {
    ws.send({ action: "set_noise", level: v });
    $("noise").value = v * 100; $("noise-val").textContent = v.toFixed(2);
  }
  function stopScenario() {
    if (scenarioTimer) { scenarioTimer.forEach(clearTimeout); scenarioTimer = null; }
    setActive("[data-scenario]", null);
  }
  document.querySelectorAll("[data-scenario]").forEach((btn) => {
    btn.onclick = () => {
      stopScenario();
      setActive("[data-scenario]", btn);
      scenarioTimer = SCENARIOS[btn.dataset.scenario].map((s) => setTimeout(s.a, s.t));
    };
  });

  // ── server performance panel: poll /api/metrics every 5 s ──
  async function pollMetrics() {
    try {
      const res = await fetch("/api/metrics");
      const m = await res.json();
      for (const stage of ["tick", "analysis", "inference", "encode"]) {
        const s = m.stages && m.stages[stage];
        $("perf-" + stage).textContent = s ? s.p95_ms.toFixed(1) + " ms" : "—";
      }
      if (m.inference) {
        const src = m.inference.source.startsWith("checkpoint") ? "trained" : m.inference.source;
        $("perf-model").textContent = `model: ${src} · ${m.inference.uncertainty}`;
      }
    } catch { /* server restarting; retry next poll */ }
  }
  pollMetrics();
  setInterval(pollMetrics, 5000);
})();

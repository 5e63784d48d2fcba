/* Reconnecting WebSocket client.
   Contract parity with the reference's TrustWebSocket (platform/frontend/js/ws.js):
   exponential backoff 1s -> 10s x1.5, JSON encode/decode, onState callback. */

class TrustWebSocket {
  constructor(path, handlers) {
    this.path = path;
    this.handlers = handlers || {};
    this.backoff = 1000;
    this.maxBackoff = 10000;
    this.ws = null;
    this.closedByUser = false;
    this.connect();
  }

  url() {
    const proto = location.protocol === "https:" ? "wss:" : "ws:";
    return `${proto}//${location.host}${this.path}`;
  }

  connect() {
    this.ws = new WebSocket(this.url());
    this.ws.onopen = () => {
      this.backoff = 1000;
      if (this.handlers.onOpen) this.handlers.onOpen();
    };
    this.ws.onmessage = (ev) => {
      let msg;
      try { msg = JSON.parse(ev.data); } catch { return; }
      if (this.handlers.onMessage) this.handlers.onMessage(msg);
    };
    this.ws.onclose = () => {
      if (this.handlers.onClose) this.handlers.onClose();
      if (!this.closedByUser) {
        setTimeout(() => this.connect(), this.backoff);
        this.backoff = Math.min(this.maxBackoff, this.backoff * 1.5);
      }
    };
    this.ws.onerror = () => this.ws.close();
  }

  send(obj) {
    if (this.ws && this.ws.readyState === WebSocket.OPEN) {
      this.ws.send(JSON.stringify(obj));
      return true;
    }
    return false;
  }

  close() {
    this.closedByUser = true;
    if (this.ws) this.ws.close();
  }
}

window.TrustWebSocket = TrustWebSocket;

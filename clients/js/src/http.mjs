/**
 * Low-level HTTP transport for the beacon-spark API. Dependency-free:
 * rides the global `fetch` (Node >= 18 / any browser). Mirrors the
 * reference SDK's transport semantics
 * (beacon-clients/beacon-ts/src/http.ts): base-path mounting, basic
 * auth, per-request timeout via AbortController, typed errors.
 */

import { ApiError, ConnectionError, TimeoutError } from "./errors.mjs";

/**
 * Build an HTTP Basic `Authorization` header value. Encodes the UTF-8
 * bytes (btoa alone is Latin-1-only and throws on wider characters).
 * @param {string} username
 * @param {string} password
 */
export function basicAuthHeader(username, password) {
  const bytes = new TextEncoder().encode(`${username}:${password}`);
  if (typeof Buffer !== "undefined") {
    return `Basic ${Buffer.from(bytes).toString("base64")}`;
  }
  let binary = "";
  for (const b of bytes) binary += String.fromCharCode(b);
  return `Basic ${globalThis.btoa(binary)}`;
}

/**
 * @typedef {Object} ClientOptions
 * @property {string} url Base URL, e.g. "http://localhost:5001".
 * @property {string} [username] Admin basic-auth user (elevates requests).
 * @property {string} [password]
 * @property {string} [token] Bearer token (alternative to basic auth).
 * @property {string} [basePath] URL prefix the server is mounted under.
 * @property {number} [timeoutMs] Per-request timeout (default 60000; 0 disables).
 * @property {typeof fetch} [fetch] Custom fetch implementation.
 * @property {Record<string, string>} [headers] Extra headers on every request.
 */

/** The resolved transport shared by the client and its sub-clients. */
export class Http {
  /** @param {ClientOptions} options */
  constructor(options) {
    const base = options.url.replace(/\/+$/, "");
    const prefix = (options.basePath ?? "").replace(/\/+$/, "");
    this.baseUrl = `${base}${prefix}`;
    const impl = options.fetch ?? globalThis.fetch;
    if (typeof impl !== "function") {
      throw new Error("global fetch is unavailable; pass a `fetch` in ClientOptions");
    }
    // bind so the native fetch keeps its receiver in browsers
    this._fetch = options.fetch ?? impl.bind(globalThis);
    this._timeoutMs = options.timeoutMs ?? 60_000;
    this._headers = options.headers ?? {};
    this._auth = undefined;
    if (options.username != null && options.password != null) {
      this._auth = basicAuthHeader(options.username, options.password);
    } else if (options.token) {
      this._auth = `Bearer ${options.token}`;
    }
  }

  /** Whether credentials are configured. */
  get authenticated() {
    return this._auth != null;
  }

  /**
   * Issue a request and return the raw `Response` after asserting a
   * 2xx status. The caller owns the body (streaming/binary results).
   * @param {string} method
   * @param {string} path
   * @param {{query?: Record<string, string|number|undefined>, json?: unknown,
   *          body?: BodyInit, headers?: Record<string, string>,
   *          signal?: AbortSignal, timeoutMs?: number}} [init]
   * @returns {Promise<Response>}
   */
  async fetchRaw(method, path, init = {}) {
    const url = this._buildUrl(path, init.query);
    /** @type {Record<string, string>} */
    const headers = { ...this._headers, ...(init.headers ?? {}) };
    if (this._auth) headers["Authorization"] ??= this._auth;
    /** @type {BodyInit | undefined} */
    let body = init.body;
    if (init.json !== undefined) {
      headers["Content-Type"] = "application/json";
      body = JSON.stringify(init.json);
    }
    const timeoutMs = init.timeoutMs ?? this._timeoutMs;
    const ctrl = new AbortController();
    const timer = timeoutMs > 0
      ? setTimeout(() => ctrl.abort(new TimeoutError(url, "timeout")), timeoutMs)
      : null;
    if (init.signal) {
      const outer = init.signal;
      if (outer.aborted) ctrl.abort(outer.reason);
      else outer.addEventListener("abort", () => ctrl.abort(outer.reason), { once: true });
    }
    let res;
    try {
      res = await this._fetch(url, { method, headers, body, signal: ctrl.signal });
    } catch (cause) {
      if (cause instanceof TimeoutError) throw cause;
      if (ctrl.signal.reason instanceof TimeoutError) throw ctrl.signal.reason;
      throw new ConnectionError(url, cause);
    } finally {
      if (timer) clearTimeout(timer);
    }
    if (!res.ok) {
      let text = "";
      try {
        text = await res.text();
      } catch {
        /* body unreadable — keep the status-only error */
      }
      throw new ApiError(res.status, text, url);
    }
    return res;
  }

  /**
   * Issue a request and decode the JSON response body.
   * @param {string} method
   * @param {string} path
   * @param {Parameters<Http["fetchRaw"]>[2]} [init]
   */
  async fetchJson(method, path, init = {}) {
    const res = await this.fetchRaw(method, path, init);
    return res.json();
  }

  /**
   * @param {string} path
   * @param {Record<string, string|number|undefined>} [query]
   */
  _buildUrl(path, query) {
    let url = `${this.baseUrl}${path.startsWith("/") ? "" : "/"}${path}`;
    if (query) {
      const qs = Object.entries(query)
        .filter(([, v]) => v !== undefined && v !== null)
        .map(([k, v]) => `${encodeURIComponent(k)}=${encodeURIComponent(String(v))}`)
        .join("&");
      if (qs) url += `?${qs}`;
    }
    return url;
  }
}

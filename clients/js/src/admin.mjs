/**
 * Authenticated administrative endpoints (`/api/admin/*`) — the routes
 * beacon_spark/server/admin.py serves (the reference's
 * beacon-server/src/axum/admin/mod.rs:38-64 route set): crawler CRUD,
 * external-table creation, dataset upload/download/delete (single-shot
 * and multipart), auth listings.
 */

export class AdminClient {
  /** @param {import("./http.mjs").Http} http */
  constructor(http) {
    this.http = http;
  }

  /** Resolves when admin access works (`GET /api/admin/check`). */
  async check() {
    await this.http.fetchRaw("GET", "/api/admin/check");
  }

  // -- crawlers ---------------------------------------------------------------

  crawlers() {
    return this.http.fetchJson("GET", "/api/admin/crawlers");
  }

  /** @param {object} definition crawler spec (name, pattern, schedule…) */
  async createCrawler(definition) {
    await this.http.fetchRaw("POST", "/api/admin/crawlers", { json: definition });
  }

  crawler(name) {
    return this.http.fetchJson("GET", `/api/admin/crawlers/${encodeURIComponent(name)}`);
  }

  async runCrawler(name) {
    await this.http.fetchRaw("POST", `/api/admin/crawlers/${encodeURIComponent(name)}/run`);
  }

  async deleteCrawler(name) {
    await this.http.fetchRaw("DELETE", `/api/admin/crawlers/${encodeURIComponent(name)}`);
  }

  // -- external tables ----------------------------------------------------------

  /** @param {object} spec CREATE EXTERNAL TABLE spec */
  async createExternalTable(spec) {
    await this.http.fetchRaw("POST", "/api/admin/external-tables", { json: spec });
  }

  // -- datasets -----------------------------------------------------------------

  /**
   * Single-shot dataset upload.
   * @param {string} path destination, relative to the datasets root
   * @param {Uint8Array | ArrayBuffer | Blob} data
   * @param {{overwrite?: boolean}} [opts]
   */
  uploadDataset(path, data, opts = {}) {
    return this.http.fetchJson("POST", "/api/admin/datasets/upload", {
      query: { path, overwrite: opts.overwrite ? "true" : undefined },
      body: data,
      headers: { "Content-Type": "application/octet-stream" },
      timeoutMs: 0,
    });
  }

  /** Raw download `Response` (stream it or `.arrayBuffer()` it). */
  downloadDataset(path) {
    return this.http.fetchRaw("GET", "/api/admin/datasets/download", {
      query: { path },
      timeoutMs: 0,
    });
  }

  async deleteDataset(path) {
    await this.http.fetchRaw("DELETE", "/api/admin/datasets", { query: { path } });
  }

  // -- auth ---------------------------------------------------------------------

  authUsers() {
    return this.http.fetchJson("GET", "/api/admin/auth/users");
  }

  authRoles() {
    return this.http.fetchJson("GET", "/api/admin/auth/roles");
  }
}

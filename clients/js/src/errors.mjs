/**
 * Error types thrown by the beacon-spark JS client.
 *
 * Mirrors the reference SDK's error taxonomy
 * (beacon-clients/beacon-ts/src/errors.ts): one base class, a
 * connection-level failure (with a timeout refinement), and an API
 * failure carrying the HTTP status and decoded body.
 */

/** Base class for every error raised by this client. */
export class BeaconError extends Error {
  constructor(message) {
    super(message);
    this.name = new.target.name;
  }
}

/** The server could not be reached (DNS, refused connection, timeout). */
export class ConnectionError extends BeaconError {
  /**
   * @param {string} url
   * @param {unknown} cause
   */
  constructor(url, cause) {
    const why = cause instanceof Error ? cause.message : String(cause);
    super(`failed to reach Beacon at ${url}: ${why}`);
    this.url = url;
    this.cause = cause;
  }
}

/** The request timed out before the server responded. */
export class TimeoutError extends ConnectionError {}

/**
 * The server returned a non-2xx status. `status` is the HTTP code and
 * `body` the best-effort decoded response body (the server answers
 * query failures with a plain-text/JSON error string).
 */
export class ApiError extends BeaconError {
  /**
   * @param {number} status
   * @param {string} body
   * @param {string} url
   */
  constructor(status, body, url) {
    super(`Beacon returned ${status} for ${url}: ${body}`);
    this.status = status;
    this.body = body;
    this.url = url;
  }
}

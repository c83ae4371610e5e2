/**
 * The main client: query execution + metadata discovery against a
 * beacon_spark HTTP server. API parity with the reference SDK's
 * `BeaconClient` (beacon-clients/beacon-ts/src/client.ts), with one
 * divergence: Arrow decoding is built in (from-spec IPC reader,
 * ./arrow.mjs) instead of delegated to the `apache-arrow` package, and
 * it asks the server for an UNCOMPRESSED stream
 * (`x-beacon-ipc-compression: none`) since no zstd codec ships here.
 *
 * ```js
 * const beacon = new BeaconClient({ url: "http://localhost:5001" });
 * const { rows } = await beacon.query("SELECT 1 AS n");
 * ```
 */

import { AdminClient } from "./admin.mjs";
import { batchesFromResponse, rowsFromTable, tableFromIPC } from "./arrow.mjs";
import { parseCsv } from "./csv.mjs";
import { Http } from "./http.mjs";
import { QueryBuilder } from "./query-builder.mjs";

const QUERY_ID_HEADER = "x-beacon-query-id";
const IPC_PLAIN = { "x-beacon-ipc-compression": "none" };

export class BeaconClient {
  /** @param {import("./http.mjs").ClientOptions} options */
  constructor(options) {
    this.http = new Http(options);
    /** Administrative endpoints (`/api/admin/*`). */
    this.admin = new AdminClient(this.http);
  }

  // -- query ------------------------------------------------------------------

  /** Start a fluent query against `source` (table name or `{format: {paths}}`). */
  from(source) {
    return new QueryBuilder(this, source);
  }

  /** Start a fluent query with a projection (shorthand for `from().select()`). */
  select(...items) {
    return new QueryBuilder(this).select(...items);
  }

  /**
   * Run a query and return `{rows, queryId, table}`. Decodes the Arrow
   * IPC stream by default; `{format: "csv"}` parses CSV instead (all
   * values strings, no `table`).
   * @param {string | object} query SQL string or JSON-DSL object
   * @param {{format?: "arrow"|"csv", signal?: AbortSignal}} [options]
   */
  async query(query, options = {}) {
    if (options.format === "csv") {
      const res = await this.queryRaw(query, "csv", options.signal);
      return {
        rows: parseCsv(await res.text()),
        queryId: res.headers.get(QUERY_ID_HEADER),
      };
    }
    const res = await this.queryRaw(query, undefined, options.signal);
    const queryId = res.headers.get(QUERY_ID_HEADER);
    const table = tableFromIPC(new Uint8Array(await res.arrayBuffer()));
    return { rows: rowsFromTable(table), queryId, table };
  }

  /** Run a query and return the decoded Arrow table. */
  async queryArrow(query, signal) {
    const res = await this.queryRaw(query, undefined, signal);
    return tableFromIPC(new Uint8Array(await res.arrayBuffer()));
  }

  /**
   * Run a query and yield decoded record batches as they arrive —
   * nothing buffers the whole result.
   */
  async *queryStream(query, signal) {
    const { batches } = await this.queryBatches(query, signal);
    for await (const b of batches) yield b;
  }

  /**
   * Open a streaming query: `{queryId, batches}` where `batches` is an
   * async iterable of decoded record batches. The query id is available
   * before the first batch; pair with an AbortSignal to stop early.
   */
  async queryBatches(query, signal) {
    const res = await this.queryRaw(query, undefined, signal);
    return {
      queryId: res.headers.get(QUERY_ID_HEADER),
      batches: batchesFromResponse(res),
    };
  }

  /** Run a query asking for CSV output; rows of string values. */
  async queryCsv(query, signal) {
    const res = await this.queryRaw(query, "csv", signal);
    return {
      rows: parseCsv(await res.text()),
      queryId: res.headers.get(QUERY_ID_HEADER),
    };
  }

  /**
   * Run a query asking the server to materialize `format` ("csv",
   * "parquet", "ipc", "netcdf", "geoparquet", "odv"; undefined = the
   * Arrow stream) and return the raw `Response`.
   */
  queryRaw(query, format, signal) {
    const body = typeof query === "string" ? { sql: query } : { ...query };
    if (format !== undefined) body.output = { format };
    // the client-level timeoutMs governs (reference contract); callers
    // running long queries construct the client with {timeoutMs: 0}
    return this.http.fetchRaw("POST", "/api/query", {
      json: body,
      signal,
      headers: format === undefined ? IPC_PLAIN : undefined,
    });
  }

  /** Validate a query body without executing it (`POST /api/parse-query`). */
  async parseQuery(query) {
    const body = typeof query === "string" ? { sql: query } : query;
    try {
      await this.http.fetchRaw("POST", "/api/parse-query", { json: body });
      return true;
    } catch {
      return false;
    }
  }

  /** The planner's explanation of a query without running it. */
  explainQuery(query, signal) {
    const body = typeof query === "string" ? { sql: query } : query;
    return this.http.fetchJson("POST", "/api/explain-query", { json: body, signal });
  }

  /** EXPLAIN ANALYZE: executes and returns the metric-annotated plan. */
  explainAnalyzeQuery(query, signal) {
    const body = typeof query === "string" ? { sql: query } : query;
    return this.http.fetchJson("POST", "/api/explain-analyze-query", {
      json: body, signal, timeoutMs: 0,
    });
  }

  /** Recorded metrics for a past query by id. */
  queryMetrics(queryId) {
    return this.http.fetchJson(
      "GET", `/api/query/metrics/${encodeURIComponent(queryId)}`);
  }

  // -- tables -----------------------------------------------------------------

  /** Registered table names (`GET /api/tables`). */
  tables() {
    return this.http.fetchJson("GET", "/api/tables");
  }

  /** Every catalog/schema/table visible to the caller (`GET /api/catalogs`). */
  catalogs() {
    return this.http.fetchJson("GET", "/api/catalogs");
  }

  /** Registered tables with their schemas (heavy on wide tables). */
  tablesWithSchema() {
    return this.http.fetchJson("GET", "/api/tables-with-schema");
  }

  /**
   * One table's schema (`GET /api/table-schema`); pass `{catalog,
   * schema}` for tables outside the defaults.
   */
  tableSchema(tableName, in_ = {}) {
    return this.http.fetchJson("GET", "/api/table-schema", {
      query: { table_name: tableName, table: tableName,
               catalog: in_.catalog, schema: in_.schema },
    });
  }

  defaultTable() {
    return this.http.fetchJson("GET", "/api/default-table");
  }

  defaultTableSchema() {
    return this.http.fetchJson("GET", "/api/default-table-schema");
  }

  // -- datasets ---------------------------------------------------------------

  /** Datasets with format metadata (`GET /api/list-datasets`). */
  datasets(opts = {}) {
    return this.http.fetchJson("GET", "/api/list-datasets", {
      query: { pattern: opts.pattern, limit: opts.limit },
    });
  }

  /** One dataset file's schema (`GET /api/dataset-schema`). */
  datasetSchema(file) {
    // the server's parameter is `dataset` (openapi.json confirms)
    return this.http.fetchJson("GET", "/api/dataset-schema", {
      query: { dataset: file },
    });
  }

  /** Total dataset count (the server answers `{total: N}`). */
  async totalDatasets() {
    const v = await this.http.fetchJson("GET", "/api/total-datasets");
    return typeof v === "number" ? v : v.total;
  }

  // -- functions & info ---------------------------------------------------------

  /** Scalar/aggregate/window functions available in queries. */
  functions() {
    return this.http.fetchJson("GET", "/api/functions");
  }

  /** Runtime system information (`GET /api/info`). */
  info() {
    return this.http.fetchJson("GET", "/api/info");
  }

  /** Liveness probe; true when `/api/health` answers 200. */
  async health() {
    try {
      await this.http.fetchRaw("GET", "/api/health");
      return true;
    } catch {
      return false;
    }
  }
}

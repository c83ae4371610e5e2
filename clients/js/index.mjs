/**
 * beacon-spark JS client — dependency-free ESM.
 *
 * The public surface mirrors the reference TypeScript SDK
 * (beacon-clients/beacon-ts/src/index.ts); typing is JSDoc instead of
 * TS (no compiler needed: `import { BeaconClient } from ".../index.mjs"`
 * runs as-is on Node >= 18 and in browsers).
 */

export { BeaconClient } from "./src/client.mjs";
export { AdminClient } from "./src/admin.mjs";
export { Http, basicAuthHeader } from "./src/http.mjs";
export { BeaconError, ApiError, ConnectionError, TimeoutError } from "./src/errors.mjs";
export {
  ArrowStreamParser,
  batchesFromResponse,
  rowsFromTable,
  tableFromIPC,
} from "./src/arrow.mjs";
export { parseCsv, parseCsvRows } from "./src/csv.mjs";
export {
  QueryBuilder,
  ColumnRef,
  FilterNode,
  col,
  and,
  or,
  column,
  func,
  literal,
} from "./src/query-builder.mjs";

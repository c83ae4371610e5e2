/**
 * Integration tests against a LIVE beacon_spark HTTP server. The pytest
 * bridge (tests/test_js_client.py) spawns the server and runs this file
 * with BEACON_URL (+ BEACON_TOKEN, BEACON_PARQUET) set; standalone
 * `node --test` runs skip it.
 */
import assert from "node:assert/strict";
import { test } from "node:test";

import { ApiError, BeaconClient, col } from "../index.mjs";

const URL = process.env.BEACON_URL;
const skip = URL ? false : "BEACON_URL not set (run via tests/test_js_client.py)";

const client = () =>
  new BeaconClient({ url: URL, token: process.env.BEACON_TOKEN || undefined });

test("health + info", { skip }, async () => {
  const c = client();
  assert.equal(await c.health(), true);
  const info = await c.info();
  assert.equal(info.engine, "beacon_spark");
});

test("SQL query decodes the Arrow stream", { skip }, async () => {
  const { rows, queryId } = await client().query(
    "SELECT 1 AS n, 'x' AS s, CAST(2.5 AS DOUBLE) AS f",
  );
  assert.deepEqual(rows, [{ n: 1, s: "x", f: 2.5 }]);
  assert.ok(queryId);
});

test("SQL over parquet via read_parquet", { skip }, async () => {
  const pq = process.env.BEACON_PARQUET;
  const { rows } = await client().query(
    `SELECT count(*) AS n FROM read_parquet('${pq}')`,
  );
  assert.ok(rows[0].n > 0);
});

test("JSON-DSL via the fluent builder", { skip }, async () => {
  const pq = process.env.BEACON_PARQUET;
  const rows = await client()
    .from({ parquet: { paths: [pq] } })
    .select("l_orderkey", "l_quantity")
    .where((x) => x.l_quantity.gte(30))
    .orderBy("l_orderkey")
    .take(5)
    .toArray();
  assert.equal(rows.length, 5);
  for (const r of rows) assert.ok(r.l_quantity >= 30);
});

test("builder first() and where(col(...))", { skip }, async () => {
  const pq = process.env.BEACON_PARQUET;
  const row = await client()
    .from({ parquet: { paths: [pq] } })
    .select("l_orderkey")
    .where(col("l_quantity").between(10, 20))
    .first();
  assert.ok(row === null || typeof row.l_orderkey === "number");
});

test("CSV path returns string rows", { skip }, async () => {
  const { rows } = await client().query("SELECT 7 AS n", { format: "csv" });
  assert.deepEqual(rows, [{ n: "7" }]);
});

test("streaming yields decoded batches", { skip }, async () => {
  const pq = process.env.BEACON_PARQUET;
  let rows = 0;
  for await (const batch of client().queryStream(
    `SELECT l_orderkey FROM read_parquet('${pq}') LIMIT 100`,
  )) {
    rows += batch.numRows;
    assert.ok(Array.isArray(batch.columns.l_orderkey));
  }
  assert.equal(rows, 100);
});

test("tables / catalogs / datasets metadata", { skip }, async () => {
  const c = client();
  const tables = await c.tables();
  assert.ok(Array.isArray(tables));
  const n = await c.totalDatasets();
  assert.ok(n >= 1);
  const ds = await c.datasets({ limit: 5 });
  assert.ok(Array.isArray(ds));
});

test("a bad query surfaces as ApiError with the server message", { skip }, async () => {
  await assert.rejects(
    () => client().query("SELECT FROM nowhere__"),
    (e) => e instanceof ApiError && e.status === 400,
  );
});

test("parseQuery validates without executing", { skip }, async () => {
  const c = client();
  assert.equal(await c.parseQuery("SELECT 1 AS a"), true);
  assert.equal(await c.parseQuery("SELECT FROM"), false);
});

test("admin check with credentials", { skip }, async () => {
  await client().admin.check();
});

test("per-route metadata coverage: schemas, metrics, explain", { skip }, async () => {
  const c = client();
  // table schema of a registered name needs one; use a dataset instead
  const ds = await c.datasetSchema("lineitem.parquet");
  assert.ok(ds && typeof ds === "object");
  // explain without executing
  const plan = await c.explainQuery("SELECT 1 AS n");
  assert.ok(plan !== undefined);
  // metrics round-trip: run a query, fetch its recorded metrics by id
  const { queryId } = await c.query("SELECT 42 AS v");
  assert.ok(queryId);
  const m = await c.queryMetrics(queryId);
  assert.equal(m.query_id, queryId);
});

test("builder distinct + output build shapes", { skip }, async () => {
  const pq = process.env.BEACON_PARQUET;
  const rows = await client()
    .from({ parquet: { paths: [pq] } })
    .distinct(["l_returnflag"])
    .toArray();
  assert.ok(rows.length >= 1 && rows.length <= 3);
  for (const r of rows) assert.ok(typeof r.l_returnflag === "string");
});

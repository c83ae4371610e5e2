"""Built-in web console served at ``/`` and ``/console``.

The reference ships an admin web UI next to its API and serves
interactive API docs at ``/swagger`` (``axum/router.rs:61-77``). This
is the self-contained analog: one dependency-free HTML page (no CDN —
servers run offline) that lists tables/datasets, runs SQL through
``POST /api/query`` with the caller's credentials, and renders rows.
The Admin panel drives the ``/api/admin/*`` router (admin.py — crawler
CRUD + run, dataset upload/delete, user/role listing), covering the
reference web UI's admin workflows without a SPA toolchain
(docs/connect/web-admin-ui.md). The API reference itself is
``GET /openapi.json`` (openapi.py)."""

from __future__ import annotations

__all__ = ["CONSOLE_HTML"]

CONSOLE_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>beacon_spark console</title>
<style>
  :root { color-scheme: light dark; }
  body { font: 14px/1.45 system-ui, sans-serif; margin: 0; display: flex;
         height: 100vh; }
  aside { width: 240px; border-right: 1px solid #8884; padding: 12px;
          overflow-y: auto; }
  main { flex: 1; padding: 12px; display: flex; flex-direction: column;
         overflow: hidden; }
  h1 { font-size: 15px; margin: 0 0 8px; }
  h2 { font-size: 12px; text-transform: uppercase; opacity: .6;
       margin: 14px 0 4px; }
  ul { list-style: none; margin: 0; padding: 0; }
  li { padding: 2px 0; cursor: pointer; overflow: hidden;
       text-overflow: ellipsis; white-space: nowrap; }
  li:hover { text-decoration: underline; }
  textarea { width: 100%; height: 110px; font: 13px/1.4 ui-monospace,
             monospace; box-sizing: border-box; }
  button { margin: 6px 0; padding: 4px 14px; }
  #status { margin-left: 10px; opacity: .7; }
  #out { flex: 1; overflow: auto; }
  table { border-collapse: collapse; font-size: 13px; }
  th, td { border: 1px solid #8884; padding: 2px 8px; text-align: left; }
  th { position: sticky; top: 0; background: Canvas; }
  .err { color: #c00; white-space: pre-wrap; }
</style>
</head>
<body>
<aside>
  <h1>beacon_spark</h1>
  <div id="version" style="opacity:.6"></div>
  <h2>Tables</h2><ul id="tables"></ul>
  <h2>Datasets</h2><ul id="datasets"></ul>
  <h2>Docs</h2>
  <ul><li onclick="location='/openapi.json'">openapi.json</li></ul>
  <h2>Admin</h2>
  <ul><li onclick="showAdmin()">open admin panel</li></ul>
</aside>
<main>
  <textarea id="sql" spellcheck="false"
    placeholder="SELECT * FROM read_parquet('...') LIMIT 100"></textarea>
  <div>
    <button onclick="run()">Run (Ctrl-Enter)</button>
    <span id="status"></span>
  </div>
  <div id="out"></div>
  <div id="admin" style="display:none; flex:1; overflow:auto">
    <p>
      <label>Authorization header (Bearer …/Basic user:pass):
        <input id="adm-auth" size="34" placeholder="(none)"></label>
    </p>
    <h2>Crawlers</h2>
    <div id="adm-crawlers"></div>
    <form onsubmit="return admCreateCrawler(this)">
      <input name="name" placeholder="crawler name" required>
      <input name="prefix" placeholder="prefix (optional)">
      <button>Create crawler</button>
    </form>
    <h2>Datasets</h2>
    <form onsubmit="return admUpload(this)">
      <input name="path" placeholder="dest path, e.g. up/data.parquet"
             required>
      <input name="file" type="file" required>
      <button>Upload</button>
    </form>
    <form onsubmit="return admDeleteDataset(this)">
      <input name="path" placeholder="dataset path to delete" required>
      <button>Delete dataset</button>
    </form>
    <h2>Users</h2><div id="adm-users"></div>
    <h2>Roles</h2><div id="adm-roles"></div>
    <div id="adm-status" class="err"></div>
  </div>
</main>
<script>
"use strict";
const $ = (id) => document.getElementById(id);
async function api(path, opts) {
  const r = await fetch(path, opts);
  const text = await r.text();
  let body; try { body = JSON.parse(text); } catch { body = text; }
  if (!r.ok) throw new Error(typeof body === "string" ? body
                             : JSON.stringify(body));
  return body;
}
function esc(s) { const d = document.createElement("span");
                  d.textContent = String(s); return d.innerHTML; }
function render(rows) {
  if (!Array.isArray(rows) || !rows.length) {
    $("out").innerHTML = "<p>(no rows)</p>"; return; }
  const cols = Object.keys(rows[0]);
  let h = "<table><thead><tr>" +
    cols.map(c => "<th>" + esc(c) + "</th>").join("") +
    "</tr></thead><tbody>";
  for (const row of rows)
    h += "<tr>" + cols.map(c => "<td>" +
      esc(row[c] === null ? "NULL" : row[c]) + "</td>").join("") + "</tr>";
  $("out").innerHTML = h + "</tbody></table>";
}
async function run() {
  const sql = $("sql").value.trim();
  if (!sql) return;
  $("status").textContent = "running…";
  $("out").innerHTML = "";
  const t0 = performance.now();
  try {
    const rows = await api("/api/query", {
      method: "POST",
      headers: {"Content-Type": "application/json"},
      body: JSON.stringify({sql: sql, format: "json"}),
    });
    render(rows);
    $("status").textContent = rows.length + " rows in " +
      ((performance.now() - t0) / 1000).toFixed(2) + "s";
  } catch (e) {
    $("status").textContent = "";
    $("out").innerHTML = "<p class='err'>" + esc(e.message) + "</p>";
  }
}
$("sql").addEventListener("keydown", (e) => {
  if ((e.ctrlKey || e.metaKey) && e.key === "Enter") run();
});
/* ---------------- admin panel (drives /api/admin/*, admin.py) ----- */
function admHeaders(extra) {
  const h = Object.assign({}, extra || {});
  const a = $("adm-auth").value.trim();
  if (a) h["Authorization"] = a;
  return h;
}
async function adm(path, opts) {
  opts = opts || {};
  opts.headers = admHeaders(opts.headers);
  try {
    $("adm-status").textContent = "";
    return await api(path, opts);
  } catch (e) {
    $("adm-status").textContent = e.message;
    throw e;
  }
}
function renderInto(id, rows) {
  const el = $(id);
  if (!Array.isArray(rows) || !rows.length) {
    el.innerHTML = "<p>(none)</p>"; return []; }
  const cols = Object.keys(rows[0]);
  let h = "<table><thead><tr>" +
    cols.map(c => "<th>" + esc(c) + "</th>").join("") +
    "</tr></thead><tbody>";
  for (const row of rows)
    h += "<tr>" + cols.map(c => "<td>" + esc(row[c]) + "</td>").join("") +
         "</tr>";
  el.innerHTML = h + "</tbody></table>";
  return rows;
}
async function showAdmin() {
  $("out").style.display = "none";
  $("admin").style.display = "block";
  await admRefresh();
}
async function admRefresh() {
  try {
    const crawlers = await adm("/api/admin/crawlers");
    renderInto("adm-crawlers", crawlers);
    for (const c of crawlers) {
      const b = document.createElement("button");
      b.textContent = "run " + c.crawler_name;
      b.onclick = () => adm("/api/admin/crawlers/" +
        encodeURIComponent(c.crawler_name) + "/run", {method: "POST"})
        .then(admRefresh);
      $("adm-crawlers").appendChild(b);
      const d = document.createElement("button");
      d.textContent = "delete " + c.crawler_name;
      d.onclick = () => adm("/api/admin/crawlers/" +
        encodeURIComponent(c.crawler_name), {method: "DELETE"})
        .then(admRefresh);
      $("adm-crawlers").appendChild(d);
    }
    renderInto("adm-users", await adm("/api/admin/auth/users"));
    renderInto("adm-roles", await adm("/api/admin/auth/roles"));
  } catch {}
}
function admCreateCrawler(f) {
  const spec = {name: f.name.value};
  if (f.prefix.value) spec.prefix = f.prefix.value;
  adm("/api/admin/crawlers", {
    method: "POST", headers: {"Content-Type": "application/json"},
    body: JSON.stringify(spec),
  }).then(admRefresh);
  return false;
}
function admUpload(f) {
  const file = f.file.files[0];
  if (!file) return false;
  adm("/api/admin/datasets/upload?path=" +
      encodeURIComponent(f.path.value),
      {method: "POST", body: file}).then(admRefresh);
  return false;
}
function admDeleteDataset(f) {
  adm("/api/admin/datasets?path=" + encodeURIComponent(f.path.value),
      {method: "DELETE"}).then(admRefresh);
  return false;
}
function li(parent, text, onclick) {
  const el = document.createElement("li");
  el.textContent = text; el.title = text; el.onclick = onclick;
  $(parent).appendChild(el);
}
(async () => {
  try {
    const info = await api("/api/info");
    $("version").textContent = info.engine + " " + info.version;
  } catch {}
  try {
    for (const t of await api("/api/tables"))
      li("tables", t, () => { $("sql").value =
        "SELECT * FROM " + t + " LIMIT 100"; run(); });
  } catch {}
  try {
    for (const d of await api("/api/datasets"))
      li("datasets", d.dataset + " (" + d.format + ")", () => {
        $("sql").value = "SELECT * FROM read_" + d.format +
          "('" + d.dataset.replaceAll("'", "''") + "') LIMIT 100"; run(); });
  } catch {}
})();
</script>
</body>
</html>
"""

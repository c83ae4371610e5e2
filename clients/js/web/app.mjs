/**
 * beacon-spark admin SPA — query workbench + lake admin pages over the
 * dependency-free JS SDK (clients/js/src). Mirrors the reference's
 * /admin application surface (docs/docs/2.0.0-rc2/connect/
 * web-admin-ui.md): login against /api/admin/check with credentials
 * kept in localStorage, a SQL workbench (run / explain / CSV download /
 * saved queries), tables with schemas + DROP, dataset browsing with
 * per-file schemas, crawler CRUD, users & roles, server info, and a
 * light/dark/system theme.
 *
 * Plain hash routing and hand-built DOM — no framework, no build step.
 */

// relative: resolves to /admin/src/client.mjs in the browser
// and through the web/src -> ../src symlink under node tests
import { BeaconClient } from "./src/client.mjs";

const $ = (id) => document.getElementById(id);
const CRED_KEY = "beacon-admin-credentials";
const THEME_KEY = "beacon-admin-theme";
const SAVED_KEY = "beacon-admin-saved-queries";

let client = null;

// ---------------------------------------------------------------- utils

function el(tag, attrs = {}, ...children) {
  const node = document.createElement(tag);
  for (const [k, v] of Object.entries(attrs)) {
    if (k === "class") node.className = v;
    else if (k.startsWith("on")) node.addEventListener(k.slice(2), v);
    else if (v !== undefined && v !== null) node.setAttribute(k, v);
  }
  for (const c of children.flat(Infinity)) {
    node.append(c instanceof Node ? c : document.createTextNode(String(c)));
  }
  return node;
}

function fmtCell(v) {
  if (v === null || v === undefined) return "∅";
  if (typeof v === "bigint") return v.toString();
  if (v instanceof Date) return v.toISOString();
  if (typeof v === "object") return JSON.stringify(v);
  return String(v);
}

/** rows (array of objects) -> a .grid table, capped for the DOM. */
function rowsTable(rows, cap = 500) {
  if (!rows.length) return el("p", { class: "muted" }, "no rows");
  const cols = Object.keys(rows[0]);
  const head = el("tr", {}, cols.map((c) => el("th", {}, c)));
  const body = rows.slice(0, cap).map((r) =>
    el("tr", {}, cols.map((c) => el("td", {}, fmtCell(r[c])))));
  const t = el("table", { class: "grid" }, head, body);
  const wrap = el("div", { class: "scroll" }, t);
  if (rows.length > cap) {
    return el("div", {}, wrap,
      el("p", { class: "muted" }, `showing ${cap} of ${rows.length} rows`));
  }
  return wrap;
}

function errBox(e) {
  return el("p", { class: "error" }, e?.message ?? String(e));
}

/** replaceChildren with nested-array flattening (the DOM API itself
 * throws on anything that is not a Node or string). */
function setView(view, ...parts) {
  view.replaceChildren(...parts.flat(Infinity).map(
    (p) => p instanceof Node ? p : document.createTextNode(String(p))));
}

// ---------------------------------------------------------------- theme

function applyTheme(mode) {
  document.body.dataset.theme = mode;
  localStorage.setItem(THEME_KEY, mode);
}

$("theme-toggle").addEventListener("click", () => {
  const order = ["system", "light", "dark"];
  const cur = localStorage.getItem(THEME_KEY) || "system";
  applyTheme(order[(order.indexOf(cur) + 1) % order.length]);
});
applyTheme(localStorage.getItem(THEME_KEY) || "system");

// ---------------------------------------------------------------- login

function makeClient(creds) {
  return new BeaconClient({ url: window.location.origin, ...creds });
}

async function tryLogin(creds) {
  const c = makeClient(creds);
  await c.admin.check(); // throws on bad credentials / non-admin
  client = c;
  localStorage.setItem(CRED_KEY, JSON.stringify(creds));
  $("login").classList.add("hidden");
  $("app").classList.remove("hidden");
  route();
}

$("login-form").addEventListener("submit", async (ev) => {
  ev.preventDefault();
  const token = $("login-token").value.trim();
  const creds = token
    ? { token }
    : { username: $("login-user").value, password: $("login-pass").value };
  try {
    await tryLogin(creds);
  } catch (e) {
    $("login-error").textContent = e?.message ?? String(e);
  }
});

$("logout").addEventListener("click", () => {
  localStorage.removeItem(CRED_KEY);
  client = null;
  $("app").classList.add("hidden");
  $("login").classList.remove("hidden");
});

// ---------------------------------------------------------------- pages

const pages = {
  "/query": pageQuery,
  "/tables": pageTables,
  "/datasets": pageDatasets,
  "/crawlers": pageCrawlers,
  "/auth": pageAuth,
  "/server": pageServer,
};

function route() {
  if (!client) return;
  const hash = window.location.hash.replace(/^#/, "") || "/query";
  const page = pages[hash] || pageQuery;
  for (const a of document.querySelectorAll("#nav a")) {
    a.classList.toggle("active", a.getAttribute("href") === `#${hash}`);
  }
  const view = $("view");
  view.replaceChildren(el("p", { class: "muted" }, "loading…"));
  page(view).catch((e) => view.replaceChildren(errBox(e)));
}
window.addEventListener("hashchange", route);

// -- query workbench ----------------------------------------------------

function savedQueries() {
  try {
    return JSON.parse(localStorage.getItem(SAVED_KEY) || "{}");
  } catch {
    return {};
  }
}

async function pageQuery(view) {
  const sql = el("textarea", { class: "sql", spellcheck: "false",
    placeholder: "SELECT … ;  Ctrl/⌘+Enter runs" });
  sql.value = sessionStorage.getItem("beacon-last-sql") ||
    "SELECT 1 AS hello";
  const out = el("div", {});
  const status = el("span", { class: "muted" });

  async function run() {
    sessionStorage.setItem("beacon-last-sql", sql.value);
    out.replaceChildren(el("p", { class: "muted" }, "running…"));
    const t0 = performance.now();
    try {
      const { rows, queryId } = await client.query(sql.value);
      const ms = Math.round(performance.now() - t0);
      status.textContent = `${rows.length} rows · ${ms} ms` +
        (queryId ? ` · query ${queryId}` : "");
      out.replaceChildren(rowsTable(rows));
    } catch (e) {
      status.textContent = "";
      out.replaceChildren(errBox(e));
    }
  }

  async function explain(analyze) {
    out.replaceChildren(el("p", { class: "muted" }, "planning…"));
    try {
      const res = analyze
        ? await client.explainAnalyzeQuery({ sql: sql.value })
        : await client.explainQuery({ sql: sql.value });
      out.replaceChildren(el("pre", { class: "plan" },
        typeof res === "string" ? res : (res.plan ?? JSON.stringify(res, null, 2))));
    } catch (e) {
      out.replaceChildren(errBox(e));
    }
  }

  async function download(format) {
    try {
      const res = await client.queryRaw({ sql: sql.value }, format);
      const blob = await res.blob();
      const a = el("a", {
        href: URL.createObjectURL(blob),
        download: `result.${format === "ipc" ? "arrow" : format}`,
      });
      document.body.append(a);
      a.click();
      a.remove();
    } catch (e) {
      out.replaceChildren(errBox(e));
    }
  }

  sql.addEventListener("keydown", (ev) => {
    if ((ev.ctrlKey || ev.metaKey) && ev.key === "Enter") {
      ev.preventDefault();
      run();
    }
  });

  const savedSel = el("select", {},
    el("option", { value: "" }, "saved queries…"),
    Object.keys(savedQueries()).sort().map((n) =>
      el("option", { value: n }, n)));
  savedSel.addEventListener("change", () => {
    const q = savedQueries()[savedSel.value];
    if (q) sql.value = q;
  });

  setView(view,
    el("h2", {}, "Query workbench"),
    el("div", { class: "card" },
      sql,
      el("div", { class: "row" },
        el("button", { onclick: run }, "Run"),
        el("button", { class: "ghost", onclick: () => explain(false) },
          "Explain"),
        el("button", { class: "ghost", onclick: () => explain(true) },
          "Explain analyze"),
        el("button", { class: "ghost", onclick: () => download("csv") },
          "CSV"),
        el("button", { class: "ghost", onclick: () => download("parquet") },
          "Parquet"),
        el("button", {
          class: "ghost",
          onclick: () => {
            const name = window.prompt("save query as:");
            if (!name) return;
            const all = savedQueries();
            all[name] = sql.value;
            localStorage.setItem(SAVED_KEY, JSON.stringify(all));
            savedSel.append(el("option", { value: name }, name));
          },
        }, "Save"),
        savedSel,
        status,
      ),
    ),
    out,
  );
}

// -- tables ---------------------------------------------------------------

async function pageTables(view) {
  const tables = await client.tablesWithSchema();
  setView(view,
    el("h2", {}, "Tables", el("span", { class: "pill" }, tables.length)),
    tables.length ? tables.map((t) =>
      el("details", { class: "card" },
        el("summary", {}, t.table_name,
          el("span", { class: "pill" }, `${t.columns.length} columns`)),
        rowsTable(t.columns.map((c) => ({
          column: c.name,
          type: typeof c.type === "string" ? c.type : JSON.stringify(c.type),
          nullable: c.nullable,
        }))),
        el("div", { class: "row" },
          el("button", {
            class: "danger",
            onclick: async (ev) => {
              if (!window.confirm(`DROP TABLE ${t.table_name}? (files are kept)`)) return;
              try {
                await client.query(`DROP TABLE ${t.table_name}`);
                route();
              } catch (e) {
                ev.target.after(errBox(e));
              }
            },
          }, "Drop table"),
        ),
      ))
      : el("p", { class: "muted" }, "no tables registered"),
  );
}

// -- datasets -------------------------------------------------------------

async function pageDatasets(view) {
  const ds = await client.datasets();
  const list = Array.isArray(ds) ? ds : (ds.datasets ?? []);
  setView(view,
    el("h2", {}, "Datasets", el("span", { class: "pill" }, list.length)),
    list.length ? list.map((d) => {
      const name = d.dataset ?? d;
      const body = el("div", {}, el("p", { class: "muted" }, "expand for schema"));
      const det = el("details", { class: "card" },
        el("summary", {}, name,
          d.format ? el("span", { class: "pill" }, d.format) : ""),
        body);
      det.addEventListener("toggle", async () => {
        if (!det.open) return;
        body.replaceChildren(el("p", { class: "muted" }, "loading schema…"));
        try {
          const schema = await client.datasetSchema(name);
          const fields = schema.fields ?? schema;
          body.replaceChildren(rowsTable(
            (Array.isArray(fields) ? fields : []).map((f) => ({
              column: f.name,
              type: typeof f.type === "string" ? f.type : JSON.stringify(f.type),
              nullable: f.nullable,
            }))));
        } catch (e) {
          body.replaceChildren(errBox(e));
        }
      }, { once: true });
      return det;
    }) : el("p", { class: "muted" }, "no datasets found"),
  );
}

// -- crawlers ---------------------------------------------------------------

async function pageCrawlers(view) {
  const crawlers = await client.admin.crawlers();
  const rows = Array.isArray(crawlers) ? crawlers : [];
  const name = el("input", { placeholder: "name" });
  const prefix = el("input", { placeholder: "prefix (e.g. data/)" });
  const err = el("p", { class: "error" });
  setView(view,
    el("h2", {}, "Crawlers", el("span", { class: "pill" }, rows.length)),
    el("div", { class: "card" },
      el("div", { class: "row" }, name, prefix,
        el("button", {
          onclick: async () => {
            try {
              await client.admin.createCrawler(
                { name: name.value, prefix: prefix.value });
              route();
            } catch (e) {
              err.textContent = e?.message ?? String(e);
            }
          },
        }, "Create crawler"), err),
    ),
    rows.length ? el("div", { class: "card" },
      rowsTable(rows),
      el("div", { class: "row" }, rows.map((c) => [
        el("button", {
          class: "ghost",
          onclick: () => client.admin.runCrawler(c.name ?? c).then(route),
        }, `run ${c.name ?? c}`),
        el("button", {
          class: "danger",
          onclick: () => client.admin.deleteCrawler(c.name ?? c).then(route),
        }, `delete ${c.name ?? c}`),
      ])),
    ) : el("p", { class: "muted" }, "no crawlers"),
  );
}

// -- users & roles ------------------------------------------------------------

async function pageAuth(view) {
  const [users, roles] = await Promise.all([
    client.admin.authUsers(), client.admin.authRoles(),
  ]);
  setView(view,
    el("h2", {}, "Users"),
    el("div", { class: "card" },
      rowsTable(Array.isArray(users) ? users : [])),
    el("h2", {}, "Roles"),
    el("div", { class: "card" },
      rowsTable(Array.isArray(roles) ? roles : [])),
    el("p", { class: "muted" },
      "manage with SQL in the workbench: CREATE USER / CREATE ROLE / " +
      "GRANT / DENY / REVOKE / SET AUTH ENFORCEMENT ON"),
  );
}

// -- server ---------------------------------------------------------------------

async function pageServer(view) {
  const [info, fns] = await Promise.all([
    client.info().catch((e) => ({ error: String(e) })),
    client.functions().catch(() => []),
  ]);
  const fnList = Array.isArray(fns) ? fns : (fns.functions ?? []);
  setView(view,
    el("h2", {}, "Server"),
    el("div", { class: "card" },
      el("p", {}, "health: ", el("span", { class: "ok" }, "Ok")),
      el("pre", { class: "plan" }, JSON.stringify(info, null, 2))),
    el("h2", {}, "Functions", el("span", { class: "pill" }, fnList.length)),
    el("div", { class: "card scroll" },
      el("p", {}, fnList.map((f) => el("code", {},
        `${typeof f === "string" ? f : f.name ?? JSON.stringify(f)} `)))),
  );
}

// ---------------------------------------------------------------- boot

(async () => {
  const saved = localStorage.getItem(CRED_KEY);
  if (saved) {
    try {
      await tryLogin(JSON.parse(saved));
      return;
    } catch {
      localStorage.removeItem(CRED_KEY);
    }
  }
  $("login").classList.remove("hidden");
})();

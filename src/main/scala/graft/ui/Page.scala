package graft.ui

/** The single static page behind `GET /` — a plain-HTML/vanilla-JS
  * counterpart of the reference's streamlit navigation (Import /
  * Export / Visualize / Labelling / Simplify tabs plus the metric
  * header, ui/__init__.py:8-17). All content renders client-side from
  * the JSON API, so the page string never depends on session state.
  */
private[ui] object Page {
  val html: String =
    """<!doctype html>
      |<html lang="en"><head><meta charset="utf-8"><title>graft</title>
      |<style>
      |  body{font-family:system-ui,sans-serif;margin:0;background:#fafafa;color:#222}
      |  header{display:flex;align-items:baseline;gap:24px;padding:12px 20px;background:#fff;
      |         border-bottom:1px solid #ddd}
      |  h1{font-size:18px;margin:0}
      |  nav button{margin-right:4px}
      |  #metrics span{margin-right:18px;font-size:14px}
      |  #metrics b{font-size:16px}
      |  .delta{color:#888;font-size:12px}
      |  main{padding:16px 20px;max-width:1100px}
      |  section{display:none}
      |  section.active{display:block}
      |  fieldset{border:1px solid #ccc;margin-bottom:12px;padding:10px}
      |  legend{font-weight:600}
      |  label{margin-right:10px}
      |  input{margin-right:8px}
      |  table{border-collapse:collapse;margin-top:8px}
      |  td,th{border:1px solid #ccc;padding:3px 8px;font-size:13px}
      |  pre{background:#f2f2f2;padding:8px;overflow:auto;max-height:400px}
      |  #status{color:#06c;min-height:1.2em}
      |  .err{color:#c00}
      |</style></head><body>
      |<header>
      |  <h1>graft</h1>
      |  <nav>
      |    <button onclick="show('import')">Import</button>
      |    <button onclick="show('export')">Export</button>
      |    <button onclick="show('visualize')">Visualize</button>
      |    <button onclick="show('labelling')">Labelling</button>
      |    <button onclick="show('simplify')">Simplify</button>
      |  </nav>
      |  <div id="metrics"></div>
      |</header>
      |<main>
      |<div id="status"></div>
      |<section id="import" class="active">
      |  <fieldset><legend>Relational snapshot</legend>
      |    <label>dir <input id="rel-dir" size="40" value="/root/testdata/sf0.001"></label>
      |    <label>db <select id="rel-db"><option>customer</option><option>orders</option></select></label>
      |    <button onclick="post('/api/import/relational?dir='+ev('rel-dir')+'&db='+ev('rel-db'))">Load</button>
      |  </fieldset>
      |  <fieldset><legend>JSONL</legend>
      |    <label>path <input id="jsonl-in" size="40"></label>
      |    <button onclick="post('/api/import/jsonl?path='+ev('jsonl-in'))">Load</button>
      |  </fieldset>
      |  <fieldset><legend>Document (JSON/XML/CSV/YAML/TOML)</legend>
      |    <label>path <input id="doc-in" size="40"></label>
      |    <button onclick="post('/api/import/document?path='+ev('doc-in'))">Load</button>
      |  </fieldset>
      |  <fieldset><legend>BRAT corpus archive</legend>
      |    <label>pattern <input id="brat-in" size="40"></label>
      |    <button onclick="post('/api/import/brat?pattern='+ev('brat-in'))">Load</button>
      |  </fieldset>
      |  <button onclick="post('/api/clear')">Clear data</button>
      |</section>
      |<section id="export">
      |  <fieldset><legend>JSONL</legend>
      |    <label>path <input id="jsonl-out" size="40"></label>
      |    <button onclick="post('/api/export/jsonl?path='+ev('jsonl-out'))">Write</button>
      |  </fieldset>
      |  <fieldset><legend>Scripts</legend>
      |    <button onclick="text('/api/export/sql')">SQL</button>
      |    <button onclick="text('/api/export/cypher')">Cypher</button>
      |  </fieldset>
      |  <pre id="script"></pre>
      |</section>
      |<section id="visualize">
      |  <button onclick="schema()">Refresh schema</button>
      |  <div id="schema"></div>
      |  <fieldset><legend>Group instances</legend>
      |    <label>group <input id="inst-group" size="20"></label>
      |    <label>limit <input id="inst-limit" size="5" value="100"></label>
      |    <button onclick="instances()">Preview</button>
      |  </fieldset>
      |  <div id="instances"></div>
      |</section>
      |<section id="labelling">
      |  <fieldset><legend>Manual rename</legend>
      |    <label>type <select id="rn-type"><option>GROUP</option><option>REL</option></select></label>
      |    <label>old <input id="rn-old" size="16"></label>
      |    <label>new <input id="rn-new" size="16"></label>
      |    <button onclick="post('/api/rename?type='+ev('rn-type')+'&old='+ev('rn-old')+'&new='+ev('rn-new'))">Apply</button>
      |  </fieldset>
      |  <fieldset><legend>LLM labelling</legend>
      |    <button onclick="post('/api/labelling/llm')">Propose + apply</button>
      |  </fieldset>
      |</section>
      |<section id="simplify">
      |  <fieldset><legend>Rule-based simplification</legend>
      |    <label>tau <input id="rw-tau" size="4" value="0.7"></label>
      |    <label>decay <input id="rw-decay" size="4" value="2.0"></label>
      |    <label>epochs <input id="rw-epochs" size="4" value="100"></label>
      |    <label>min support <input id="rw-min" size="4"></label>
      |    <label>schema only <input id="rw-schema" type="checkbox"></label>
      |    <button onclick="rewrite()">Apply</button>
      |  </fieldset>
      |</section>
      |</main>
      |<script>
      |function ev(id){return encodeURIComponent(document.getElementById(id).value)}
      |// labels/values come from imported files — escape before innerHTML
      |function esc(v){return String(v).replace(/[&<>"']/g,
      |  c=>({'&':'&amp;','<':'&lt;','>':'&gt;','"':'&quot;',"'":'&#39;'}[c]))}
      |function show(id){
      |  document.querySelectorAll('section').forEach(s=>s.classList.remove('active'));
      |  document.getElementById(id).classList.add('active');
      |}
      |function setStatus(msg,err){const s=document.getElementById('status');
      |  s.textContent=msg;s.className=err?'err':''}
      |async function refresh(){
      |  const m=await (await fetch('/api/metrics')).json();
      |  const names=[['trees','Total Trees'],['entities','Entities'],['groups','Groups'],['relations','Relations']];
      |  document.getElementById('metrics').innerHTML=names.map(([k,label])=>{
      |    const d=m.current[k]-m.previous[k];
      |    const delta=d?` <span class="delta">(${d>0?'+':''}${d})</span>`:'';
      |    return `<span>${label} <b>${m.current[k]}</b>${delta}</span>`;
      |  }).join('');
      |}
      |async function post(url){
      |  setStatus('working…');
      |  const r=await (await fetch(url,{method:'POST'})).json();
      |  if(r.error){setStatus(r.error,true)}else{setStatus('done');await refresh()}
      |}
      |async function text(url){
      |  setStatus('working…');
      |  const r=await fetch(url);const t=await r.text();
      |  if(r.ok){document.getElementById('script').textContent=t;setStatus('done')}
      |  else setStatus(t,true);
      |}
      |async function schema(){
      |  const s=await (await fetch('/api/schema')).json();
      |  if(s.error){setStatus(s.error,true);return}
      |  let h='<h3>Groups</h3><table><tr><th>group</th><th>entities</th></tr>';
      |  for(const [g,ents] of Object.entries(s.groups))
      |    h+=`<tr><td>${esc(g)}</td><td>${esc(ents.join(', '))}</td></tr>`;
      |  h+='</table><h3>Relations</h3><table><tr><th>relation</th><th>left</th><th>right</th></tr>';
      |  for(const r of s.relations) h+=`<tr><td>${esc(r.name)}</td><td>${esc(r.left)}</td><td>${esc(r.right)}</td></tr>`;
      |  h+='</table><h3>Productions</h3><pre>'+esc(s.productions.join('\n'))+'</pre>';
      |  document.getElementById('schema').innerHTML=h;
      |}
      |async function instances(){
      |  const g=ev('inst-group'),l=ev('inst-limit');
      |  const d=await (await fetch(`/api/instances?group=${g}&limit=${l}`)).json();
      |  if(d.error){setStatus(d.error,true);return}
      |  let h='<table><tr>'+d.columns.map(c=>`<th>${esc(c)}</th>`).join('')+'</tr>';
      |  for(const row of d.rows)
      |    h+='<tr>'+d.columns.map(c=>`<td>${esc(row[c]??'')}</td>`).join('')+'</tr>';
      |  document.getElementById('instances').innerHTML=h+'</table>';
      |}
      |async function rewrite(){
      |  let url=`/api/rewrite?tau=${ev('rw-tau')}&decay=${ev('rw-decay')}&epochs=${ev('rw-epochs')}`;
      |  const m=document.getElementById('rw-min').value;
      |  if(m)url+=`&minSupport=${encodeURIComponent(m)}`;
      |  if(document.getElementById('rw-schema').checked)url+='&schemaOnly=true';
      |  await post(url);
      |}
      |refresh();
      |</script></body></html>
      |""".stripMargin
}

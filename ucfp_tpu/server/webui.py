"""Self-hosted playground dashboard (layer 7).

The reference ships a SvelteKit control plane on Cloudflare (Pages + D1 +
KV + R2) with an interactive algorithm playground, pipeline inspector,
search and records UI (web/, SURVEY.md section 2.3). This build serves
the same capabilities as a single self-hosted page straight from the
service — no build system, no external services; auth/keys/usage already
live in the core server. The page drives the public JSON API:
  /v1/algorithms -> algorithm picker + tunables
  /v1/ingest/*   -> fingerprinting
  /v1/pipeline/inspect/* -> stage visualizations (MinHash slot heatmap,
                            SimHash bits, image stage thumbnails, audio
                            envelope + peak constellation)
  /v1/query      -> search
"""

PAGE = r"""<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>ucfp-tpu playground</title>
<style>
 body{font-family:system-ui,sans-serif;margin:0;background:#0e1117;color:#e6edf3}
 header{padding:12px 20px;background:#161b22;display:flex;gap:16px;align-items:center}
 h1{font-size:16px;margin:0}
 main{max-width:1060px;margin:0 auto;padding:20px}
 .tabs{display:flex;gap:8px;margin-bottom:16px}
 .tabs button{background:#21262d;color:#e6edf3;border:1px solid #30363d;
   padding:6px 14px;border-radius:6px;cursor:pointer}
 .tabs button.active{background:#1f6feb;border-color:#1f6feb}
 textarea,input,select{background:#0d1117;color:#e6edf3;border:1px solid #30363d;
   border-radius:6px;padding:6px;font-family:ui-monospace,monospace}
 textarea{width:100%;min-height:90px}
 .row{display:flex;gap:10px;flex-wrap:wrap;margin:8px 0;align-items:center}
 .card{background:#161b22;border:1px solid #30363d;border-radius:8px;
   padding:14px;margin-bottom:14px}
 .hex{font-family:ui-monospace,monospace;font-size:11px;word-break:break-all;
   max-height:120px;overflow:auto;background:#0d1117;padding:8px;border-radius:6px}
 canvas{background:#0d1117;border-radius:6px}
 button.go{background:#238636;color:#fff;border:0;padding:8px 18px;
   border-radius:6px;cursor:pointer;font-weight:600}
 label{font-size:12px;color:#8b949e}
 .kv{font-size:12px;color:#8b949e} .kv b{color:#e6edf3}
 img.stage{image-rendering:pixelated;border-radius:4px;border:1px solid #30363d}
</style>
</head>
<body>
<header>
 <h1>ucfp-tpu playground</h1>
 <label>API token <input id="token" size="18" placeholder="bearer token"></label>
 <label>tenant <input id="tenant" size="4" value="0"></label>
 <span class="kv" id="info"></span>
 <span style="flex:1"></span>
 <label>email <input id="acct-email" size="16" placeholder="you@example.com"></label>
 <label>password <input id="acct-pw" type="password" size="10"></label>
 <button class="go" onclick="acct('signup')">Sign up</button>
 <button class="go" onclick="acct('login')">Log in</button>
 <button class="go" style="background:#6e7681" onclick="acct('logout')">Log out</button>
 <span class="kv" id="acct-state"></span>
</header>
<main>
 <div class="tabs">
  <button data-tab="text" class="active">Text</button>
  <button data-tab="image">Image</button>
  <button data-tab="audio">Audio</button>
  <button data-tab="search">Search</button>
  <button data-tab="records">Records</button>
  <button data-tab="bulk">Bulk</button>
  <button data-tab="usage">Usage</button>
  <button data-tab="keys">Keys</button>
 </div>

 <section id="tab-text" class="card">
  <div class="row">
   <label>algorithm <select id="text-algo"></select></label>
   <label>k <input id="text-k" size="3" value="5"></label>
   <label>h <input id="text-h" size="4" value="128"></label>
   <button class="go" onclick="runText()">Fingerprint</button>
  </div>
  <textarea id="text-input">the quick brown fox jumps over the lazy dog</textarea>
  <div id="text-out"></div>
 </section>

 <section id="tab-image" class="card" style="display:none">
  <div class="row">
   <label>algorithm <select id="img-algo"></select></label>
   <input type="file" id="img-file" accept="image/*">
   <button class="go" onclick="runImage()">Fingerprint</button>
  </div>
  <div id="img-out"></div>
 </section>

 <section id="tab-audio" class="card" style="display:none">
  <div class="row">
   <label>algorithm <select id="aud-algo"></select></label>
   <input type="file" id="aud-file" accept="audio/*">
   <button class="go" onclick="runAudio()">Fingerprint</button>
   <span class="kv">decoded to mono f32 in-browser (WebAudio), like the
   reference demo</span>
  </div>
  <div id="aud-out"></div>
 </section>

 <section id="tab-search" class="card" style="display:none">
  <div class="row">
   <label>terms <input id="q-terms" size="30" placeholder="keyword search"></label>
   <label>k <input id="q-k" size="3" value="10"></label>
   <label><input type="checkbox" id="q-explain" checked> explain</label>
   <button class="go" onclick="runQuery()">Search</button>
  </div>
  <div id="q-out"></div>
 </section>

 <section id="tab-records" class="card" style="display:none">
  <div class="row">
   <label>record id <input id="r-id" size="10"></label>
   <button class="go" onclick="describeRec()">Describe</button>
   <button class="go" style="background:#da3633" onclick="deleteRec()">Delete</button>
  </div>
  <div id="r-out"></div>
 </section>

 <section id="tab-bulk" class="card" style="display:none">
  <div class="row">
   <label>algorithm <select id="bulk-algo">
    <option value="minhash">minhash</option><option value="simhash-tf">simhash-tf</option>
    <option value="tlsh">tlsh</option></select></label>
   <label>start record id <input id="bulk-start" size="8" value="1000"></label>
   <button class="go" onclick="runBulk()">Ingest lines</button>
   <span class="kv">one text record per line (the dashboard bulk page)</span>
  </div>
  <textarea id="bulk-input" placeholder="one document per line"></textarea>
  <div id="bulk-out"></div>
 </section>

 <section id="tab-usage" class="card" style="display:none">
  <div class="row">
   <label>limit <input id="u-limit" size="5" value="200"></label>
   <button class="go" onclick="loadUsage()">Refresh</button>
   <span class="kv">tenant-scoped unless service bearer</span>
  </div>
  <div id="u-out"></div>
 </section>

 <section id="tab-keys" class="card" style="display:none">
  <div class="row">
   <label>tenant <input id="k-tenant" size="4" value="1"></label>
   <label>key id <input id="k-id" size="12" placeholder="optional"></label>
   <button class="go" onclick="createKey()">Issue key</button>
   <button class="go" onclick="listKeys()">List</button>
   <span class="kv">service bearer required</span>
  </div>
  <div id="k-out"></div>
 </section>
</main>
<script>
const $=id=>document.getElementById(id);
const tok=()=>$('token').value.trim();
const ten=()=>parseInt($('tenant').value)||0;
let RID=1;
document.querySelectorAll('.tabs button').forEach(b=>b.onclick=()=>{
 document.querySelectorAll('.tabs button').forEach(x=>x.classList.remove('active'));
 b.classList.add('active');
 ['text','image','audio','search','records','bulk','usage','keys'].forEach(t=>
   $('tab-'+t).style.display = t===b.dataset.tab?'':'none');
});
$('token').value = localStorage.getItem('ucfp_token')||'';
$('token').onchange=()=>localStorage.setItem('ucfp_token',tok());

async function api(path, opts={}){
 // bearer wins when pasted; otherwise the ucfp_session cookie (set by
 // signup/login below) authenticates, scoped to the account's tenant
 const auth = tok() ? {'Authorization':'Bearer '+tok()} : {};
 opts.headers = Object.assign(auth, opts.headers||{});
 const r = await fetch(path, opts);
 const body = await r.json().catch(()=>({}));
 if(!r.ok) throw new Error(body.message||r.status);
 return body;
}
async function acct(kind){
 try{
  const body = kind==='logout' ? '{}' : JSON.stringify(
    {email:$('acct-email').value.trim(), password:$('acct-pw').value});
  const out = await api('/v1/auth/'+kind, {method:'POST', body});
  if(kind==='logout'){ $('acct-state').textContent='signed out'; return; }
  $('tenant').value = out.tenant_id;
  $('acct-state').textContent = out.email+' (tenant '+out.tenant_id+')';
 }catch(e){ $('acct-state').textContent = 'auth: '+e.message; }
}
// restore an existing session on load
fetch('/v1/auth/whoami').then(r=>r.ok?r.json():null).then(w=>{
 if(w && w.key_id && w.key_id.startsWith('session:')){
  $('tenant').value = w.tenant_id;
  $('acct-state').textContent = w.key_id.slice(8)+' (tenant '+w.tenant_id+')';
 }
}).catch(()=>{});
fetch('/v1/info').then(r=>r.json()).then(i=>$('info').textContent=
  i.name+' v'+i.version).catch(()=>{});
fetch('/v1/algorithms').then(r=>r.json()).then(m=>{
 for(const [sel, cat] of [['text-algo','text'],['img-algo','image'],['aud-algo','audio']]){
  const s=$(sel);
  m[cat].algorithms.forEach(a=>{
   const o=document.createElement('option');o.value=a.id;o.textContent=a.label;
   s.appendChild(o);
  });
 }
});

function kv(obj, keys){return keys.map(k=>`<span class="kv">${k} <b>${obj[k]}</b></span>`).join(' · ');}
function hexBox(h){return `<div class="hex">${h}</div>`;}

function slotHeatmap(sig){
 // MinHash slot heatmap: 16x8 grid coloured by slot value
 const c=document.createElement('canvas');c.width=320;c.height=160;
 const g=c.getContext('2d');
 sig.forEach((v,i)=>{
  const hue = Number(BigInt(v) % 360n);
  g.fillStyle=`hsl(${hue},60%,45%)`;
  g.fillRect((i%16)*20, Math.floor(i/16)*20, 19, 19);
 });
 return c;
}
function bitGrid(hex, w, h, cell){
 const c=document.createElement('canvas');c.width=w*cell;c.height=h*cell;
 const g=c.getContext('2d');
 const bytes = hex.match(/../g).map(x=>parseInt(x,16));
 for(let i=0;i<w*h;i++){
  const bit = (bytes[i>>3] >> (i&7)) & 1;
  g.fillStyle = bit?'#58a6ff':'#21262d';
  g.fillRect((i%w)*cell, Math.floor(i/w)*cell, cell-1, cell-1);
 }
 return c;
}

async function runText(){
 const algo=$('text-algo').value;
 const q=`algorithm=${algo}&k=${$('text-k').value}&h=${$('text-h').value}`;
 const out=$('text-out'); out.innerHTML='…';
 try{
  const ins = await api(`/v1/pipeline/inspect/text?${q}&tenant_id=${ten()}`,
    {method:'POST', body:$('text-input').value});
  const fp = await api(`/v1/ingest/text/${ten()}/${RID++}?${q}`,
    {method:'POST', body:$('text-input').value});
  out.innerHTML = `<div class="row">${kv(fp,['algorithm','fingerprint_bytes','config_hash','record_id'])}</div>`
   + `<div class="kv">canonicalized</div><div class="hex">${ins.canonicalized}</div>`
   + `<div class="kv">tokens (${ins.tokens.length})</div><div class="hex">${ins.tokens.join(' ')}</div>`
   + hexBox(fp.fingerprint_hex.slice(0,512)+(fp.fingerprint_hex.length>512?'…':''));
  if(algo==='minhash'||algo==='lsh'){
   const d=document.createElement('div');d.innerHTML='<div class="kv">MinHash slot heatmap</div>';
   d.appendChild(slotHeatmap(ins.signature_u64)); out.appendChild(d);
  }
  if(algo.startsWith('simhash')){
   const d=document.createElement('div');d.innerHTML='<div class="kv">SimHash bits</div>';
   d.appendChild(bitGrid(fp.fingerprint_hex,8,8,16)); out.appendChild(d);
  }
 }catch(e){out.innerHTML=`<div class="hex">error: ${e.message}</div>`;}
}

async function runImage(){
 const f=$('img-file').files[0]; const out=$('img-out');
 if(!f){out.textContent='pick a file';return;}
 out.innerHTML='…';
 const bytes = await f.arrayBuffer();
 const algo=$('img-algo').value;
 try{
  const ins = await api(`/v1/pipeline/inspect/image?tenant_id=${ten()}`,
    {method:'POST', body:bytes});
  const fp = await api(`/v1/ingest/image/${ten()}/${RID++}?algorithm=${algo}`,
    {method:'POST', body:bytes});
  out.innerHTML = `<div class="row">${kv(fp,['algorithm','fingerprint_bytes','record_id'])}</div>`
   + `<div class="row">
    <span><div class="kv">original ${ins.width}x${ins.height}</div>
      <img class="stage" src="data:image/png;base64,${ins.original_png_b64}" height="128"></span>
    <span><div class="kv">32x32 gray (pHash DCT input)</div>
      <img class="stage" src="data:image/png;base64,${ins.gray32_png_b64}" width="96" height="96"></span>
    <span><div class="kv">8x8 gray (aHash, mean ${ins.ahash_mean})</div>
      <img class="stage" src="data:image/png;base64,${ins.gray8_png_b64}" width="96" height="96"></span>
   </div>` + hexBox(fp.fingerprint_hex);
  if(fp.fingerprint_bytes>=8){
   const d=document.createElement('div');
   d.innerHTML='<div class="kv">pHash bits</div>';
   d.appendChild(bitGrid(fp.fingerprint_hex.slice(0,16),8,8,16));
   out.appendChild(d);
  }
  // Hamming search over previously ingested fingerprints of this algorithm
  const sim=document.createElement('div');
  sim.innerHTML=`<button class="go" style="margin-top:8px">Find similar</button>
    <span id="img-sim" class="kv"></span>`;
  sim.querySelector('button').onclick=async()=>{
   try{
    const res = await api('/v1/query', {method:'POST', body: JSON.stringify(
     {tenant_id: ten(), modality:'image', k:5,
      fingerprint_hex: fp.fingerprint_hex, algorithm: fp.algorithm})});
    const hits=(res.hits||[]).map(h=>
      `#${h.record_id} (${(h.score*100).toFixed(1)}%)`).join('  ');
    sim.querySelector('#img-sim').textContent = hits || 'no matches';
   }catch(e){ sim.querySelector('#img-sim').textContent='error: '+e.message; }
  };
  out.appendChild(sim);
 }catch(e){out.innerHTML=`<div class="hex">error: ${e.message}</div>`;}
}

async function runAudio(){
 const f=$('aud-file').files[0]; const out=$('aud-out');
 if(!f){out.textContent='pick a file';return;}
 out.innerHTML='decoding…';
 const ac = new (window.AudioContext||window.webkitAudioContext)({sampleRate:8000});
 const buf = await ac.decodeAudioData(await f.arrayBuffer());
 const mono = buf.getChannelData(0);
 const body = new Float32Array(mono).buffer;
 const algo=$('aud-algo').value;
 try{
  const ins = await api(`/v1/pipeline/inspect/audio?sample_rate=8000&algorithm=${algo}&tenant_id=${ten()}`,
    {method:'POST', body});
  const fp = await api(`/v1/ingest/audio/${ten()}/${RID++}?sample_rate=8000&algorithm=${algo}`,
    {method:'POST', body});
  out.innerHTML = `<div class="row">${kv(ins,['duration_secs','total_peaks','total_landmarks'])}</div>`
   + `<div class="row">
      <span><div class="kv">linear spectrogram</div>
       <img class="stage" src="data:image/png;base64,${ins.lin_spec_png_b64}" width="256"></span>
      <span><div class="kv">mel spectrogram</div>
       <img class="stage" src="data:image/png;base64,${ins.mel_spec_png_b64}" width="256"></span>
     </div>`;
  // envelope
  const env=document.createElement('canvas');env.width=512;env.height=80;
  const g=env.getContext('2d');g.strokeStyle='#58a6ff';g.beginPath();
  ins.envelope.forEach((v,i)=>{const y=40-v*38;g.moveTo(i*2,40+(40-y));g.lineTo(i*2,y);});
  g.stroke(); out.appendChild(env);
  // peak constellation + landmark lines
  const c=document.createElement('canvas');c.width=512;c.height=200;
  const g2=c.getContext('2d');
  const tmax = Math.max(...ins.peaks.map(p=>p.t_ms),1);
  g2.strokeStyle='rgba(88,166,255,.35)';
  ins.landmarks.slice(0,200).forEach(l=>{g2.beginPath();
   g2.moveTo(l.t1_ms/tmax*500, 195-l.f1_hz/4000*190);
   g2.lineTo(l.t2_ms/tmax*500, 195-l.f2_hz/4000*190);g2.stroke();});
  g2.fillStyle='#f78166';
  ins.peaks.forEach(p=>g2.fillRect(p.t_ms/tmax*500-1, 195-p.freq_hz/4000*190-1, 3,3));
  out.appendChild(c);
  if(fp.fingerprint_hex) out.innerHTML += hexBox(fp.fingerprint_hex.slice(0,512)+'…');
  else out.innerHTML += `<div class="row">${kv(fp,['detected','confidence'])}</div>`;
 }catch(e){out.innerHTML=`<div class="hex">error: ${e.message}</div>`;}
}

async function runQuery(){
 const out=$('q-out'); out.innerHTML='…';
 try{
  const body={tenant_id:ten(),modality:'text',k:parseInt($('q-k').value)||10,
              terms:$('q-terms').value.split(/\s+/).filter(x=>x)};
  const res=await api('/v1/query?explain='+($('q-explain').checked?1:0),
    {method:'POST',body:JSON.stringify(body)});
  out.innerHTML = res.hits.length? res.hits.map(h=>
   `<div class="row">${kv(h,['record_id','score','source'])}`
   +(h.term_hits?h.term_hits.map(t=>`<span class="kv">${t.term}:${t.contribution.toFixed(3)}</span>`).join(''):'')
   +`</div>`).join('') : '<div class="kv">no hits</div>';
 }catch(e){out.innerHTML=`<div class="hex">error: ${e.message}</div>`;}
}

async function describeRec(){
 const out=$('r-out');
 try{
  const d=await api(`/v1/records/${ten()}/${$('r-id').value}`);
  out.innerHTML=`<div class="row">${kv(d,['record_id','modality','algorithm','fingerprint_bytes','has_embedding'])}</div>`;
 }catch(e){out.innerHTML=`<div class="hex">error: ${e.message}</div>`;}
}
async function runBulk(){
 const lines = $('bulk-input').value.split('\n').map(s=>s.trim()).filter(Boolean);
 const algo = $('bulk-algo').value; let rid = parseInt($('bulk-start').value)||1000;
 const out = $('bulk-out'); out.textContent = '';
 const t0 = performance.now(); let ok = 0, fail = 0;
 for(const line of lines){
  try{
   await api(`/v1/ingest/text/${ten()}/${rid++}?algorithm=${algo}`,
             {method:'POST', body: JSON.stringify({text: line})});
   ok++;
  }catch(e){ fail++; }
  if((ok+fail) % 10 === 0) out.textContent = `${ok+fail}/${lines.length}…`;
 }
 const dt = ((performance.now()-t0)/1000).toFixed(2);
 out.innerHTML = `<div class="kv"><b>${ok}</b> ingested, ${fail} failed in ${dt}s`
   + ` (${(ok/Math.max(dt,0.01)).toFixed(0)}/s) — ids ${rid-ok-fail}…${rid-1}</div>`;
}
async function loadUsage(){
 const out = $('u-out');
 try{
  const u = await api('/v1/admin/usage?limit='+(parseInt($('u-limit').value)||200));
  const evs = u.events||[];
  const byOp = {};
  evs.forEach(e=>byOp[e.op]=(byOp[e.op]||0)+1);
  const chips = Object.entries(byOp).map(([k,v])=>`<b>${k}</b>: ${v}`).join(' · ');
  const rows = evs.slice(-50).reverse().map(e=>
   `<tr><td>${new Date(e.ts).toISOString().slice(11,19)}</td><td>${e.tenant_id}</td>`
   + `<td>${e.key_id||''}</td><td>${e.op}</td><td>${e.status}</td>`
   + `<td>${e.bytes_in}</td><td>${(e.elapsed_ms||0).toFixed(1)}ms</td></tr>`).join('');
  out.innerHTML = `<div class="kv">${evs.length} events — ${chips||'none'}</div>`
   + `<table style="font-size:12px;border-spacing:8px 2px"><tr><th>time</th><th>tenant</th>`
   + `<th>key</th><th>op</th><th>status</th><th>bytes</th><th>ms</th></tr>${rows}</table>`;
 }catch(e){ out.textContent = 'usage: '+e.message; }
}
async function createKey(){
 const out=$('k-out');
 try{
  const body={tenant_id:parseInt($('k-tenant').value)||0};
  if($('k-id').value) body.key_id=$('k-id').value;
  const k=await api('/v1/admin/keys',{method:'POST',body:JSON.stringify(body)});
  out.innerHTML=`<div class="kv">token (copy now — shown once):</div><div class="hex">${k.token}</div>`
   +`<div class="row">${kv(k,['key_id','tenant_id','prefix'])}</div>`;
 }catch(e){out.innerHTML=`<div class="hex">error: ${e.message}</div>`;}
}
async function listKeys(){
 const out=$('k-out');
 try{
  const r=await api('/v1/admin/keys');
  out.innerHTML = r.keys.length? r.keys.map(k=>
   `<div class="row">${kv(k,['key_id','tenant_id','prefix'])}
    <button class="go" style="background:#da3633;padding:2px 8px"
     onclick="revokeKey('${k.key_id}')">revoke</button></div>`).join('')
   : '<div class="kv">no issued keys</div>';
 }catch(e){out.innerHTML=`<div class="hex">error: ${e.message}</div>`;}
}
async function revokeKey(id){
 try{ await api('/v1/admin/keys/'+id,{method:'DELETE'}); listKeys(); }
 catch(e){ $('k-out').innerHTML=`<div class="hex">error: ${e.message}</div>`; }
}
async function deleteRec(){
 const out=$('r-out');
 try{ await api(`/v1/records/${ten()}/${$('r-id').value}`,{method:'DELETE'});
  out.innerHTML='<div class="kv">deleted</div>';
 }catch(e){out.innerHTML=`<div class="hex">error: ${e.message}</div>`;}
}
</script>
</body>
</html>
"""

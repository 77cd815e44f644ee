"""The single-page app served by ui/server.py.

Layout mirrors the reference's TrainUI tabs (modules/ui/TrainUI.py:
general/model/data/concepts/training/sampling/backup + toolbar), rendered
as a dynamic form over the TrainConfig dict: scalar fields group into
tabs by name; samples/embeddings edit as JSON. Concepts get a structured
per-concept editor with folder stats and a live augmentation preview
(reference: ConceptWindow), the optimizer gets a per-optimizer settings
dialog over OPTIMIZER_DEFAULT_PARAMETERS (reference:
OptimizerParamsWindow), and the dataset tab includes an interactive
canvas mask painter that saves `-masklabel.png` (reference:
CaptionUI.py:53-60). No build step, no dependencies — one <script> tag.
"""

PAGE_HTML = r"""<!doctype html>
<html><head><meta charset="utf-8"><title>onetrainer-tpu</title>
<style>
 body{font-family:system-ui,sans-serif;margin:0;background:#14161a;color:#e6e6e6}
 header{display:flex;align-items:center;gap:12px;padding:10px 16px;background:#1d2127}
 header h1{font-size:16px;margin:0}
 button{background:#2d7ff9;color:#fff;border:0;border-radius:4px;padding:6px 14px;cursor:pointer}
 button.warn{background:#c0392b} button.sec{background:#3a404a}
 #status{margin-left:auto;font-size:13px;color:#9ad}
 nav{display:flex;gap:4px;padding:8px 16px;background:#181b20}
 nav button{background:#23272e} nav button.active{background:#2d7ff9}
 main{padding:12px 16px}
 .grid{display:grid;grid-template-columns:repeat(auto-fill,minmax(330px,1fr));gap:6px 18px}
 .field{display:flex;align-items:center;gap:8px;font-size:13px}
 .field label{flex:1;color:#aab;overflow:hidden;text-overflow:ellipsis;white-space:nowrap}
 .field input[type=text],.field input[type=number]{width:150px;background:#23272e;color:#e6e6e6;border:1px solid #3a404a;border-radius:3px;padding:3px 6px}
 textarea{width:100%;height:320px;background:#23272e;color:#e6e6e6;border:1px solid #3a404a;font-family:monospace;font-size:12px}
 #loss{background:#181b20;border:1px solid #3a404a}
 #samples img{max-width:180px;margin:4px;border:1px solid #3a404a}
 .bar{height:6px;background:#23272e;border-radius:3px;overflow:hidden;margin:6px 0}
 .bar div{height:100%;background:#2d7ff9;width:0}
 select{background:#23272e;color:#e6e6e6;border:1px solid #3a404a;padding:4px}
</style></head><body>
<header>
 <h1>onetrainer-tpu</h1>
 <button id="start">start training</button>
 <button id="stop" class="warn">stop</button>
 <button id="save" class="sec">save</button>
 <button id="backup" class="sec">backup</button>
 <button id="sample" class="sec">sample now</button>
 <select id="presets"><option value="">presets…</option></select>
 <span id="status">idle</span>
</header>
<div class="bar"><div id="prog"></div></div>
<nav id="tabs"></nav>
<main>
 <div id="form" class="grid"></div>
 <div id="jsonpane" style="display:none"><textarea id="jsontext"></textarea>
  <button id="jsonapply">apply</button> <span id="jsonerr" style="color:#e66"></span></div>
 <div id="conceptpane" style="display:none"></div>
 <div id="listpane" style="display:none"></div>
 <div id="optpane" style="display:none"></div>
 <div id="monitor" style="display:none">
  <canvas id="loss" width="900" height="220"></canvas>
  <div id="samples"></div>
  <form id="customform" onsubmit="return false" style="display:flex;gap:6px;align-items:center;margin:10px 0">
   <b style="font-size:13px">custom sample</b>
   <input type="text" id="customprompt" placeholder="prompt" style="flex:1;background:#23272e;color:#e6e6e6;border:1px solid #3a404a;padding:4px">
   <input type="number" id="customseed" value="42" style="width:70px;background:#23272e;color:#e6e6e6;border:1px solid #3a404a;padding:4px">
   <button id="customrun">sample</button>
  </form>
  <div id="customsamples"></div>
  <div style="margin-top:10px">
   <button id="tsplot" class="sec">plot timestep distribution</button>
   <canvas id="tshist" width="900" height="160" style="display:block;background:#181b20;border:1px solid #3a404a;margin-top:4px"></canvas>
  </div>
 </div>
 <div id="tools" style="display:none">
  <div style="display:flex;gap:8px;align-items:center;margin-bottom:8px">
   <input type="text" id="dsdir" placeholder="dataset folder" style="flex:1;background:#23272e;color:#e6e6e6;border:1px solid #3a404a;padding:4px">
   <button id="dsload">load</button>
  </div>
  <div style="display:flex;gap:20px;margin-bottom:8px;font-size:13px">
   <form id="capform" onsubmit="return false" style="display:flex;gap:6px;align-items:center">
    <b>batch caption</b>
    <select id="capmodel"><option>blip</option><option>blip2</option></select>
    <select id="capmode"><option>fill</option><option>replace</option><option>add</option></select>
    <button id="caprun">run</button>
   </form>
   <form id="maskform" onsubmit="return false" style="display:flex;gap:6px;align-items:center">
    <b>batch mask</b>
    <select id="maskmodel"><option>clipseg</option><option>color</option></select>
    <input type="text" id="maskprompt" placeholder="prompt(s)" style="background:#23272e;color:#e6e6e6;border:1px solid #3a404a;padding:3px">
    <button id="maskrun">run</button>
   </form>
   <span id="toolstat"></span>
  </div>
  <div style="display:flex;gap:20px;margin-bottom:8px;font-size:13px">
   <form id="vidform" onsubmit="return false" style="display:flex;gap:6px;align-items:center">
    <b>video tool</b>
    <select id="vidmode"><option>clips</option><option>frames</option></select>
    <input type="text" id="vidin" placeholder="video file" style="background:#23272e;color:#e6e6e6;border:1px solid #3a404a;padding:3px">
    <input type="text" id="vidout" placeholder="output dir" style="background:#23272e;color:#e6e6e6;border:1px solid #3a404a;padding:3px">
    <button id="vidrun">run</button>
   </form>
   <form id="convform" onsubmit="return false" style="display:flex;gap:6px;align-items:center">
    <b>convert model</b>
    <input type="text" id="convin" placeholder="input" style="width:120px;background:#23272e;color:#e6e6e6;border:1px solid #3a404a;padding:3px">
    <input type="text" id="convout" placeholder="output" style="width:120px;background:#23272e;color:#e6e6e6;border:1px solid #3a404a;padding:3px">
    <select id="convfmt"><option>SAFETENSORS</option><option>DIFFUSERS</option></select>
    <button id="convrun">run</button>
   </form>
  </div>
  <div id="dsgrid" class="grid"></div>
 </div>
</main>
<script>
const TABS = {
 general: k=>/^(workspace_dir|cache_dir|debug|tensorboard|validat|continue_|secrets|cloud|device|train_dtype|temp_|save_|dataloader)/.test(k),
 model: k=>/^(model_type|base_model_name|weight_dtype|output_model|unet|prior|text_encoder|vae|effnet|decoder|embedding_weight|quantization|compile|gradient_checkpointing|force_circ|layer_skip|include_train_config)/.test(k),
 data: k=>/^(aspect|resolution|frames|latent_caching|clear_cache|concept_file|custom_conditioning|circular_mask|random_rotate|image_variations)/.test(k),
 training: k=>/^(optimizer|learning_rate|epochs|batch_size|gradient_accumulation|ema|clip_grad|train_device|loss|mse_|mae_|log_cosh|vb_loss|masked|unmasked|normalize_masked|prior_loss|min_snr|debiased|p2_|timestep|noising|offset_noise|perturbation|rescale_noise|min_noising|max_noising|noise_|dynamic_|custom_learning|learning|stop_training|attention|align_prop|preserve_embedding)/.test(k),
 sampling: k=>/^(sample|non_ema_sampling|samples_to_tensor)/.test(k),
 backup: k=>/^(backup|rolling_backup|save_every|save_skip)/.test(k),
};
const JSON_TABS = {samples:"samples",
 "embedding/additional":"additional_embeddings"};
const NAV = ["general","model","data","concepts","training","optimizer",
 "sampling","backup",...Object.keys(JSON_TABS),"monitor","tools"];
let config = {}, tab = "general";

function el(t,attrs={},...kids){const e=document.createElement(t);
 for(const[k,v]of Object.entries(attrs)){if(k=="onclick")e.onclick=v;else e.setAttribute(k,v)}
 kids.forEach(k=>e.append(k));return e}

async function api(path,body){const r=await fetch(path,body?{method:"POST",
 body:JSON.stringify(body)}:{});return r.json()}

function renderTabs(){const nav=document.getElementById("tabs");nav.innerHTML="";
 for(const name of NAV){
  nav.append(el("button",{class:name==tab?"active":"",
   onclick:()=>{tab=name;rawMode=false;render()}},name))}}

function fieldInput(key,val){
 if(typeof val=="boolean"){const i=el("input",{type:"checkbox"});i.checked=val;
  i.onchange=()=>push({[key]:i.checked});return i}
 const i=el("input",{type:"text",value:val===null?"":String(val)});
 i.onchange=()=>{let v=i.value;
  if(typeof val=="number"&&v!=="")v=Number(v);
  if(val===null&&v==="")v=null;
  push({[key]:v})};
 return i}

function render(){renderTabs();
 const form=document.getElementById("form"),jp=document.getElementById("jsonpane"),
       mon=document.getElementById("monitor"),tl=document.getElementById("tools"),
       cp=document.getElementById("conceptpane"),op=document.getElementById("optpane"),
       lp=document.getElementById("listpane");
 form.style.display=jp.style.display=mon.style.display=tl.style.display=
  cp.style.display=op.style.display=lp.style.display="none";
 if(tab=="monitor"){mon.style.display="block";return}
 if(tab=="tools"){tl.style.display="block";return}
 if(tab=="concepts"){renderConcepts();return}
 if(tab=="optimizer"){renderOptimizer();return}
 if(tab in JSON_TABS){
  if(!rawMode){renderList(tab);return}
  jp.style.display="block";
  document.getElementById("jsontext").value=
   JSON.stringify(config[JSON_TABS[tab]],null,1);return}
 form.style.display="grid";form.innerHTML="";
 const match=TABS[tab];
 const claimed=k=>Object.values(TABS).some(m=>m(k));
 for(const[k,v]of Object.entries(config)){
  if(typeof v=="object"&&v!==null)continue;
  if(tab=="general" ? (match(k)||!claimed(k)) : match(k))
   form.append(el("div",{class:"field"},el("label",{},k),fieldInput(k,v)))}}

async function push(patch){const r=await api("/api/config",patch);
 if(!r.ok)alert(JSON.stringify(r));config=await api("/api/config")}

/* ---- structured list editors for samples / additional embeddings
   (reference: SamplingTab + SampleParamsWindow, AdditionalEmbeddingsTab
   — ConfigList forms; raw JSON stays available as a fallback) ---- */
let rawMode=false, listIdx={};
function renderList(t){
 const key=JSON_TABS[t];
 const pane=document.getElementById("listpane");
 pane.style.display="block";pane.innerHTML="";
 const list=config[key]||[];
 let idx=listIdx[t]||0;
 if(idx>=list.length)idx=Math.max(0,list.length-1);
 listIdx[t]=idx;
 const sel=el("select",{});
 list.forEach((c,i)=>{const o=el("option",{value:i},
  (i+1)+": "+(c.prompt||c.model_name||c.placeholder||key));
  if(i==idx)o.selected=true;sel.append(o)});
 sel.onchange=()=>{listIdx[t]=Number(sel.value);render()};
 const save=()=>push({[key]:list});
 pane.append(el("div",{style:"display:flex;gap:8px;margin-bottom:8px;align-items:center"},
  sel,
  el("button",{class:"sec",onclick:async()=>{
   await push({[key]:[...list,{}]});listIdx[t]=list.length;render()}},"add"),
  el("button",{class:"warn",onclick:async()=>{
   list.splice(idx,1);await save();render()}},"remove"),
  el("button",{class:"sec",onclick:()=>{rawMode=true;render()}},"edit raw JSON")));
 const c=list[idx];
 if(c)pane.append(fieldGrid(c,save))}

/* ---- structured concept editor (reference: ConceptWindow — per-concept
   form + folder stats + live augmentation preview) ---- */
let conceptIdx=0, previewImgIdx=0, previewSeed=0;
function scalarField(obj,key,onset){const val=obj[key];
 if(typeof val=="boolean"){const i=el("input",{type:"checkbox"});i.checked=val;
  i.onchange=()=>{obj[key]=i.checked;onset()};return i}
 const i=el("input",{type:"text",value:val===null?"":String(val)});
 i.onchange=()=>{let v=i.value;
  if(typeof val=="number"&&v!=="")v=Number(v);
  if(val===null&&v==="")v=null;
  obj[key]=v;onset()};
 return i}
function fieldGrid(obj,onset,skip){const g=el("div",{class:"grid"});
 for(const[k,v]of Object.entries(obj)){
  if((skip||[]).includes(k)||typeof v=="object"&&v!==null)continue;
  g.append(el("div",{class:"field"},el("label",{},k),scalarField(obj,k,onset)))}
 return g}
async function renderConcepts(){
 const pane=document.getElementById("conceptpane");
 pane.style.display="block";pane.innerHTML="";
 const list=config.concepts||[];
 if(conceptIdx>=list.length)conceptIdx=Math.max(0,list.length-1);
 const sel=el("select",{});
 list.forEach((c,i)=>{const o=el("option",{value:i},
  (i+1)+": "+(c.name||c.path||"concept"));if(i==conceptIdx)o.selected=true;
  sel.append(o)});
 sel.onchange=()=>{conceptIdx=Number(sel.value);render()};
 const save=()=>push({concepts:list});
 pane.append(el("div",{style:"display:flex;gap:8px;margin-bottom:8px;align-items:center"},
  sel,
  el("button",{class:"sec",onclick:async()=>{
   await push({concepts:[...list,{}]});conceptIdx=list.length;render()}},"add"),
  el("button",{class:"warn",onclick:async()=>{
   list.splice(conceptIdx,1);await save();render()}},"remove"),
  el("button",{class:"sec",onclick:async()=>{
   const c=list[conceptIdx];if(!c)return;
   const r=await api("/api/concept/stats?path="+encodeURIComponent(c.path||""));
   const s=document.getElementById("cstats");s.innerHTML="";
   for(const[k,v]of Object.entries(r))s.append(el("div",{},k+": "+JSON.stringify(v)))}},
   "folder stats"),
  el("button",{class:"sec",onclick:()=>conceptPreview(list[conceptIdx])},"preview augmentation"),
  el("button",{class:"sec",onclick:()=>{previewImgIdx++;conceptPreview(list[conceptIdx])}},"next image")));
 const c=list[conceptIdx];
 if(c){
  pane.append(fieldGrid(c,save));
  for(const sub of["image","text"])if(c[sub]&&typeof c[sub]=="object"){
   pane.append(el("h3",{style:"margin:10px 0 4px;font-size:13px;color:#9ad"},sub+" augmentation"));
   pane.append(fieldGrid(c[sub],save))}}
 pane.append(el("div",{id:"cstats",style:"font-size:12px;color:#9ad;margin-top:8px"}));
 pane.append(el("div",{id:"cpreview",style:"display:flex;gap:10px;margin-top:8px;align-items:flex-start"}))}
async function conceptPreview(c){if(!c)return;
 previewSeed++;
 const r=await api("/api/concept/preview",
  {concept:c,seed:previewSeed,index:previewImgIdx});
 const p=document.getElementById("cpreview");p.innerHTML="";
 if(r.error){p.textContent=r.error;return}
 p.append(el("img",{src:"data:image/png;base64,"+r.image,style:"max-width:260px;border:1px solid #3a404a"}));
 if(r.mask)p.append(el("img",{src:"data:image/png;base64,"+r.mask,style:"max-width:260px;border:1px solid #3a404a"}));
 p.append(el("div",{style:"font-size:12px;color:#9ad"},
  r.name+" ("+(r.index+1)+"/"+r.count+")",el("br",{}),r.caption||""))}

/* ---- optimizer settings dialog (reference: OptimizerParamsWindow over
   OPTIMIZER_DEFAULT_PARAMETERS + change_optimizer persistence) ---- */
async function renderOptimizer(){
 const pane=document.getElementById("optpane");
 pane.style.display="block";pane.innerHTML="";
 const r=await api("/api/optimizer/params");
 const sel=el("select",{});
 for(const o of r.optimizers||[]){const opt=el("option",{value:o},o);
  if(o==r.optimizer)opt.selected=true;sel.append(opt)}
 sel.onchange=async()=>{await api("/api/optimizer/change",{optimizer:sel.value});
  config=await api("/api/config");render()};
 pane.append(el("div",{style:"display:flex;gap:8px;margin-bottom:8px;align-items:center"},
  el("b",{style:"font-size:13px"},"optimizer"),sel,
  el("span",{style:"font-size:12px;color:#9ad"},
   "settings are remembered per optimizer")));
 const g=el("div",{class:"grid"});
 for(const k of r.keys||[]){const v=r.params[k];
  const i=el("input",{type:"text",value:v===null||v===undefined?"":String(v)});
  i.onchange=async()=>{let val=i.value;
   if(val==="")val=null;
   else if(val==="true"||val==="false")val=val==="true";
   else if(!isNaN(Number(val)))val=Number(val);
   await api("/api/optimizer/params",{[k]:val});
   config=await api("/api/config")};
  g.append(el("div",{class:"field"},el("label",{},k),i))}
 pane.append(g);
 /* ---- LR scheduler settings (reference: SchedulerParamsWindow —
    scheduler choice, CUSTOM class name, key/value params list with
    %PLACEHOLDER% values) ---- */
 const s=await api("/api/scheduler/params");
 const ssel=el("select",{});
 for(const o of s.schedulers||[]){const opt=el("option",{value:o},o);
  if(o==s.scheduler)opt.selected=true;ssel.append(opt)}
 const cls=el("input",{type:"text",value:s.custom_class||"",
  placeholder:"<module>.<ClassName> (CUSTOM)"});
 let params=s.params||[];
 const plist=el("div",{});
 async function saveSched(){
  const r=await api("/api/scheduler/params",
   {scheduler:ssel.value,custom_class:cls.value,params:params});
  if(r.params)params=r.params;
  config=await api("/api/config")}
 function renderParams(){
  plist.innerHTML="";
  params.forEach((p,i)=>{
   const k=el("input",{type:"text",value:p.key,placeholder:"key"});
   const v=el("input",{type:"text",value:p.value,placeholder:"value"});
   k.onchange=()=>{p.key=k.value;saveSched()};
   v.onchange=()=>{p.value=v.value;saveSched()};
   const x=el("button",{},"X");
   x.onclick=()=>{params.splice(i,1);renderParams();saveSched()};
   plist.append(el("div",{style:"display:flex;gap:4px;margin:2px 0"},x,k,v))})}
 renderParams();
 ssel.onchange=saveSched;cls.onchange=saveSched;
 const add=el("button",{},"add parameter");
 add.onclick=()=>{params.push({key:"",value:""});renderParams()};
 pane.append(el("div",{style:"margin-top:14px"},
  el("b",{style:"font-size:13px"},"LR scheduler"),
  el("div",{style:"display:flex;gap:8px;margin:6px 0;align-items:center"},
   ssel,el("span",{style:"font-size:12px;color:#9ad"},"CUSTOM class:"),cls),
  el("div",{style:"font-size:11px;color:#889"},
   "value placeholders: "+(s.placeholders||[]).map(x=>"%"+x+"%").join(" ")),
  plist,add))}

/* ---- interactive mask painting (reference: CaptionUI.py:53-60 mask
   paint/fill) — canvas brush over the image, saved as -masklabel.png ---- */
function paintMask(d,row){
 const img=new Image();
 img.src="/dataset/image?dir="+encodeURIComponent(d)+"&name="+encodeURIComponent(row.name);
 img.onload=()=>{
  const W=img.naturalWidth,H=img.naturalHeight;
  const disp=el("canvas",{width:W,height:H,
   style:"max-width:75vw;max-height:70vh;border:1px solid #3a404a;cursor:crosshair"});
  const mcan=document.createElement("canvas");mcan.width=W;mcan.height=H;
  const mctx=mcan.getContext("2d");mctx.fillStyle="#000";mctx.fillRect(0,0,W,H);
  const dctx=disp.getContext("2d");
  let brush=Math.max(8,Math.round(W/24)),erase=false,drawing=false;
  function redraw(){dctx.globalAlpha=1;dctx.drawImage(img,0,0);
   dctx.globalAlpha=.45;dctx.drawImage(mcan,0,0);dctx.globalAlpha=1}
  function dot(e){const r=disp.getBoundingClientRect();
   const x=(e.clientX-r.left)*W/r.width,y=(e.clientY-r.top)*H/r.height;
   mctx.fillStyle=erase?"#000":"#fff";
   mctx.beginPath();mctx.arc(x,y,brush,0,7);mctx.fill();redraw()}
  disp.onmousedown=e=>{drawing=true;dot(e)};
  disp.onmousemove=e=>{if(drawing)dot(e)};
  disp.onmouseup=disp.onmouseleave=()=>{drawing=false};
  const size=el("input",{type:"range",min:2,max:Math.round(W/4),value:brush});
  size.oninput=()=>brush=Number(size.value);
  const mode=el("button",{class:"sec",onclick:()=>{erase=!erase;
   mode.textContent=erase?"erasing":"painting"}},"painting");
  const ov=el("div",{id:"maskov",style:"position:fixed;inset:0;background:#000d;z-index:10;display:flex;flex-direction:column;align-items:center;justify-content:center;gap:8px"},
   el("div",{style:"display:flex;gap:8px;align-items:center;font-size:13px"},
    el("b",{},row.name),"brush",size,mode,
    el("button",{class:"sec",onclick:()=>{mctx.fillStyle="#fff";mctx.fillRect(0,0,W,H);redraw()}},"fill"),
    el("button",{class:"sec",onclick:()=>{mctx.fillStyle="#000";mctx.fillRect(0,0,W,H);redraw()}},"clear"),
    el("button",{onclick:async()=>{
     await api("/api/dataset/mask",{dir:d,name:row.name,mask:mcan.toDataURL("image/png")});
     ov.remove();loadDataset()}},"save mask"),
    el("button",{class:"warn",onclick:()=>ov.remove()},"close")),
   disp);
  document.body.append(ov);
  if(row.has_mask){const m=new Image();
   m.src="/dataset/image?dir="+encodeURIComponent(d)+"&name="+
    encodeURIComponent(row.name.replace(/\.[^.]+$/,"")+"-masklabel.png");
   m.onload=()=>{mctx.drawImage(m,0,0,W,H);redraw()};m.onerror=()=>redraw()}
  else redraw()}}

document.getElementById("jsonapply").onclick=async()=>{
 try{const v=JSON.parse(document.getElementById("jsontext").value);
  await push({[JSON_TABS[tab]]:v});document.getElementById("jsonerr").textContent=""}
 catch(e){document.getElementById("jsonerr").textContent=String(e)}};

for(const[id,path]of[["start","/api/train/start"],["stop","/api/train/stop"],
 ["save","/api/train/save"],["backup","/api/train/backup"],
 ["sample","/api/train/sample"]])
 document.getElementById(id).onclick=()=>api(path,{});

async function loadPresets(){const r=await api("/api/presets");
 const s=document.getElementById("presets");
 for(const name of r.presets||[])s.append(el("option",{value:name},name));
 s.onchange=async()=>{if(!s.value)return;
  await api("/api/preset/load",{name:s.value});config=await api("/api/config");render()}}

function drawLoss(hist){const c=document.getElementById("loss"),x=c.getContext("2d");
 x.clearRect(0,0,c.width,c.height);if(!hist.length)return;
 const ys=hist.map(p=>p[1]),mx=Math.max(...ys),mn=Math.min(...ys);
 x.strokeStyle="#2d7ff9";x.beginPath();
 hist.forEach((p,i)=>{const px=i/(hist.length-1||1)*(c.width-20)+10,
  py=c.height-15-((p[1]-mn)/((mx-mn)||1))*(c.height-30);
  i?x.lineTo(px,py):x.moveTo(px,py)});x.stroke();
 x.fillStyle="#9ad";x.font="11px monospace";
 x.fillText("loss "+ys[ys.length-1].toFixed(4)+"  (min "+mn.toFixed(4)+" max "+mx.toFixed(4)+")",10,12)}

async function poll(){try{const s=await api("/api/status");
 document.getElementById("status").textContent=
  s.state+(s.status?" — "+s.status:"")+(s.error?" — "+s.error:"");
 const p=s.progress||{};
 if(p.max_epoch)document.getElementById("prog").style.width=
  (100*(p.epoch+(p.max_sample?p.epoch_step/p.max_sample:0))/p.max_epoch)+"%";
 drawLoss(s.loss||[]);
 const sd=document.getElementById("samples");
 const want=(s.samples||[]).filter(n=>/\.(png|jpg|webp)$/.test(n));
 if(sd.dataset.keys!=want.join()){sd.dataset.keys=want.join();sd.innerHTML="";
  want.forEach(n=>sd.append(el("img",{src:"/samples/"+n.split("/").map(encodeURIComponent).join("/"),title:n})))}
 const cd=document.getElementById("customsamples");
 const cwant=(s.custom_samples||[]).filter(n=>/\.(png|jpg|webp)$/.test(n));
 if(cd.dataset.keys!=cwant.join()){cd.dataset.keys=cwant.join();cd.innerHTML="";
  cwant.forEach(n=>cd.append(el("img",{src:"/samples/custom/"+encodeURIComponent(n),title:n})))}
 }catch(e){}setTimeout(poll,1500)}

document.getElementById("customrun").onclick=()=>api("/api/train/sample_custom",
 {prompt:document.getElementById("customprompt").value,
  seed:Number(document.getElementById("customseed").value)||42});

document.getElementById("tsplot").onclick=async()=>{
 const r=await api("/api/timesteps");
 const c=document.getElementById("tshist"),x=c.getContext("2d");
 x.clearRect(0,0,c.width,c.height);
 const mx=Math.max(...r.counts,1),w=(c.width-20)/r.counts.length;
 x.fillStyle="#2d7ff9";
 r.counts.forEach((n,i)=>{const h=n/mx*(c.height-30);
  x.fillRect(10+i*w,c.height-15-h,w-1,h)});
 x.fillStyle="#9ad";x.font="11px monospace";
 x.fillText(r.distribution+"  (t=0 … 1000)",10,12)};

async function loadDataset(){const d=document.getElementById("dsdir").value;
 const r=await api("/api/dataset?dir="+encodeURIComponent(d));
 const g=document.getElementById("dsgrid");g.innerHTML="";
 for(const row of r.images||[]){
  const ta=el("textarea",{style:"height:52px"});ta.value=row.caption;
  const save=el("button",{class:"sec",onclick:async()=>{
   await api("/api/dataset/caption",{dir:d,name:row.name,caption:ta.value})}},"save");
  const paint=el("button",{class:"sec",onclick:()=>paintMask(d,row)},
   row.has_mask?"edit mask":"paint mask");
  g.append(el("div",{},
   el("img",{src:"/dataset/image?dir="+encodeURIComponent(d)+"&name="+encodeURIComponent(row.name),
             style:"max-width:160px;display:block"}),
   el("div",{style:"font-size:11px;color:#9ad"},row.name+(row.has_mask?" [mask]":"")),
   ta,save,paint))}}
document.getElementById("dsload").onclick=loadDataset;
document.getElementById("caprun").onclick=()=>api("/api/tools/caption",
 {dir:document.getElementById("dsdir").value,
  model:document.getElementById("capmodel").value,
  mode:document.getElementById("capmode").value});
document.getElementById("vidrun").onclick=()=>api("/api/tools/video",
 {mode:document.getElementById("vidmode").value,
  video:document.getElementById("vidin").value,
  output_dir:document.getElementById("vidout").value});
document.getElementById("convrun").onclick=()=>api("/api/tools/convert",
 {model_type:(config.model_type||"STABLE_DIFFUSION_15"),
  input:document.getElementById("convin").value,
  output:document.getElementById("convout").value,
  output_model_format:document.getElementById("convfmt").value});
document.getElementById("maskrun").onclick=()=>api("/api/tools/mask",
 {dir:document.getElementById("dsdir").value,
  model:document.getElementById("maskmodel").value,
  prompt:document.getElementById("maskprompt").value});
async function pollTools(){try{const t=await api("/api/tools/status");
 document.getElementById("toolstat").textContent=t.running?
  (t.kind+" "+t.done+"/"+t.total):(t.error||"");}catch(e){}
 setTimeout(pollTools,2000)}
(async()=>{config=await api("/api/config");render();loadPresets();poll();pollTools()})();
</script></body></html>
"""

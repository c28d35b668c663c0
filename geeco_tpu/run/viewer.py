"""Interactive debug viewer (browser-based).

TPU-native stand-in for the reference's interactive GL viewer
(``--rendering_mode viewer`` -> mujoco-py ``render('human')`` window,
reference: src/geeco_gym/pickplace.py:47,80,590-591 and
scripts/gym_pickplace.py:119-120).  A GL window makes no sense on a TPU
host, so the viewer serves an interactive page on localhost instead:

  playback   python -m geeco_tpu.run.viewer --episode <replay_buffer.npz>
             scrub/play a recorded episode with cmd/EE/object overlays
  live       python -m geeco_tpu.run.viewer --scene pad2-cube2 --policy expert
             steps the env server-side (expert | zero policy) and streams
             freshly rendered frames one control step per tick

Then open http://localhost:8008 (or --port).  No external deps: stdlib
http.server + PIL for PNG encoding.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>geeco_tpu viewer</title><style>
 body { background:#14151a; color:#d8d9e0; font:14px system-ui,sans-serif;
        display:flex; flex-direction:column; align-items:center; }
 h3 { font-weight:600; margin:12px 0 4px; }
 #frame { image-rendering:pixelated; width:512px; border:1px solid #333; }
 #bar { width:512px; margin:8px 0; display:flex; gap:8px; align-items:center;}
 input[type=range] { flex:1; }
 button { background:#2a2c36; color:#d8d9e0; border:1px solid #444;
          border-radius:4px; padding:4px 12px; cursor:pointer; }
 #info { width:512px; white-space:pre; font:12px ui-monospace,monospace;
         color:#9aa0b0; }
 canvas { width:512px; height:80px; border:1px solid #333; margin-top:6px; }
</style></head><body>
<h3 id="title">geeco_tpu viewer</h3>
<img id="frame"/>
<div id="bar">
 <button id="play">&#9654;</button>
 <input type="range" id="seek" min="0" max="0" value="0"/>
 <span id="stepno">0</span>
</div>
<div id="info"></div>
<canvas id="plot" width="512" height="80"></canvas>
<script>
const img=document.getElementById('frame'),seek=document.getElementById('seek'),
 info=document.getElementById('info'),stepno=document.getElementById('stepno'),
 playBtn=document.getElementById('play'),plot=document.getElementById('plot');
let meta=null, playing=false, timer=null, live=false, liveStep=0;
const fmt=v=>Array.isArray(v)?'['+v.map(x=>x.toFixed(3)).join(', ')+']'
                             :(typeof v==='number'?v.toFixed(4):v);
function drawPlot(upto){
  if(!meta||!meta.cmd) return;
  const ctx=plot.getContext('2d'); ctx.clearRect(0,0,512,80);
  const T=meta.cmd.length,C=meta.cmd[0].length;
  const cols=['#e06c75','#98c379','#61afef','#e5c07b','#c678dd','#56b6c2'];
  let lo=1e9,hi=-1e9;
  meta.cmd.flat().forEach(v=>{lo=Math.min(lo,v);hi=Math.max(hi,v);});
  const sy=v=>76-72*(v-lo)/Math.max(hi-lo,1e-9), sx=i=>i*511/Math.max(T-1,1);
  for(let c=0;c<C;c++){ ctx.strokeStyle=cols[c%6]; ctx.beginPath();
    for(let i=0;i<T;i++){ const x=sx(i),y=sy(meta.cmd[i][c]);
      i?ctx.lineTo(x,y):ctx.moveTo(x,y);} ctx.stroke(); }
  ctx.strokeStyle='#fff'; ctx.beginPath();
  ctx.moveTo(sx(upto),0); ctx.lineTo(sx(upto),80); ctx.stroke();
}
function show(i){
  if(live) return;
  img.src='/frame/'+i; stepno.textContent=i; seek.value=i;
  let s='';
  for(const k of Object.keys(meta.scalars))
    s+=k.padEnd(12)+' '+fmt(meta.scalars[k][i])+'\\n';
  info.textContent=s; drawPlot(i);
}
async function liveTick(){
  const r=await fetch('/live/step'); const d=await r.json();
  img.src='data:image/png;base64,'+d.png; liveStep=d.i;
  stepno.textContent=d.i;
  let s=''; for(const k of Object.keys(d.scalars))
    s+=k.padEnd(12)+' '+fmt(d.scalars[k])+'\\n';
  info.textContent=s;
}
function setPlaying(p){ playing=p; playBtn.innerHTML=p?'&#9646;&#9646;':'&#9654;';
  clearInterval(timer);
  if(p) timer=setInterval(()=>{ if(live){liveTick();return;}
    let i=(parseInt(seek.value)+1)%(parseInt(seek.max)+1); show(i); },100);
}
playBtn.onclick=()=>setPlaying(!playing);
seek.oninput=()=>{ setPlaying(false); show(parseInt(seek.value)); };
fetch('/meta').then(r=>r.json()).then(m=>{ meta=m; live=m.live;
  document.getElementById('title').textContent=m.title;
  if(live){ setPlaying(true); } else { seek.max=m.n_steps-1; show(0); }});
</script></body></html>"""


def _png_b64(rgb: np.ndarray) -> str:
  return base64.b64encode(_png_bytes(rgb)).decode()


def _png_bytes(rgb: np.ndarray) -> bytes:
  from PIL import Image
  buf = io.BytesIO()
  Image.fromarray(np.asarray(rgb, np.uint8)).save(buf, 'PNG')
  return buf.getvalue()


class EpisodeSource:
  """Playback of a recorded replay buffer (npz + sibling json meta)."""

  def __init__(self, path: str):
    self.data = np.load(path)
    self.rgb = self.data['rgb']
    self.n = int(self.rgb.shape[0])
    keys = ('cmd', 'ctrl', 'obj_qpos', 'goal_qpos',
            'mocap_qpos-robot0:mocap', 'ts')
    self.scalars = {k.split('-')[0]: np.asarray(self.data[k]).round(4)
                    for k in keys if k in self.data.files}
    self.title = path.rsplit('/', 1)[-1]

  def meta(self) -> dict:
    return {'live': False, 'title': self.title, 'n_steps': self.n,
            'cmd': self.scalars.get('cmd', np.zeros((self.n, 1))).tolist(),
            'scalars': {k: v.tolist() for k, v in self.scalars.items()}}

  def frame(self, i: int) -> bytes:
    return _png_bytes(self.rgb[min(max(i, 0), self.n - 1)])


class LiveSource:
  """Steps a live env server-side, one control step per /live/step."""

  def __init__(self, scene: str, policy: str, frame_res: int):
    import jax
    from ..envs.base import make_env
    from ..expert.policies import init_expert_state, make_expert
    self.jax = jax
    self.env = make_env(scene, frame_res=(frame_res, frame_res))
    self.env.setup()
    self.policy = policy
    self.expert = make_expert(self.env) if policy == 'expert' else None
    self.xs = init_expert_state()
    self.rng = jax.random.PRNGKey(0)
    self.lock = threading.Lock()
    self.title = f'{scene} (live, {policy})'
    self.i = 0
    self._reset()

    if policy == 'expert':
      def tick(es, xs):
        cmd, xs2 = self.expert(es, xs)
        es2 = self.env.step(es, cmd)
        return es2, xs2, cmd, self.env.render(es2)
    else:
      def tick(es, xs):
        cmd = jax.numpy.zeros((4,))
        es2 = self.env.step(es, cmd)
        return es2, xs, cmd, self.env.render(es2)
    self.tick = jax.jit(tick)

  def _reset(self):
    from ..expert.policies import init_expert_state
    self.rng, k = self.jax.random.split(self.rng)
    self.es = self.env.reset(k)
    self.xs = init_expert_state()
    self.i = 0

  def meta(self) -> dict:
    return {'live': True, 'title': self.title, 'scalars': {}}

  def step(self) -> dict:
    with self.lock:
      if self.i >= 100:
        self._reset()
      self.es, self.xs, cmd, rgb = self.tick(self.es, self.xs)
      self.i += 1
      m = self.env.eval_metrics(self.es)
      scalars = {'cmd': np.asarray(cmd).round(4).tolist(),
                 'goal_dist': round(float(m['goal_dist']), 4),
                 'task_success': float(m['task_success'])}
      return {'i': self.i, 'png': _png_b64(np.asarray(rgb)),
              'scalars': scalars}


def make_handler(src):
  class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
      pass

    def _send(self, body: bytes, ctype: str):
      self.send_response(200)
      self.send_header('Content-Type', ctype)
      self.send_header('Content-Length', str(len(body)))
      self.end_headers()
      self.wfile.write(body)

    def do_GET(self):
      if self.path == '/' or self.path.startswith('/index'):
        self._send(_PAGE.encode(), 'text/html')
      elif self.path == '/meta':
        self._send(json.dumps(src.meta()).encode(), 'application/json')
      elif self.path.startswith('/frame/'):
        self._send(src.frame(int(self.path.rsplit('/', 1)[-1])), 'image/png')
      elif self.path == '/live/step':
        self._send(json.dumps(src.step()).encode(), 'application/json')
      else:
        self.send_error(404)
  return Handler


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--episode', type=str, default=None,
                 help='replay_buffer npz to scrub (playback mode)')
  p.add_argument('--scene', type=str, default='pad2-cube2',
                 help='scene for live mode (when no --episode given)')
  p.add_argument('--policy', type=str, default='expert',
                 choices=['expert', 'zero'], help='live-mode policy')
  p.add_argument('--frame_res', type=int, default=128)
  p.add_argument('--port', type=int, default=8008)
  args = p.parse_args(argv)

  if args.episode:
    src = EpisodeSource(args.episode)
    print(f'>>> viewing {args.episode} ({src.n} steps)')
  else:
    print(f'>>> building live env {args.scene} (first step compiles, '
          'may take minutes)')
    src = LiveSource(args.scene, args.policy, args.frame_res)
  server = ThreadingHTTPServer(('127.0.0.1', args.port), make_handler(src))
  print(f'>>> viewer at http://localhost:{args.port}')
  server.serve_forever()


if __name__ == '__main__':
  main()

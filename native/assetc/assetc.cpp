// assetc — native scenario-asset compiler.
//
// C++ replacement for the asset-ingestion path the reference delegates to
// PyBullet's C++ URDF/OBJ loaders (pybullet.py:518-532 loadURDF /
// load_scenario, consumed by ReachAO.setup_benchmark_scenario,
// reach_ao.py:292-306).  Parses scenario URDF files + OBJ meshes and emits
// flat world-frame AABB tables ready for the JAX engine's obstacle arrays.
//
// Exposed as a C ABI (compile_scenario / assetc_free) consumed through
// ctypes (panda_gym_tpu/native.py); tools/compile_scenarios.py remains the
// pure-Python fallback producing identical output.
//
// Build:  make -C native  (produces native/libassetc.so)

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Vec3 {
  double x = 0, y = 0, z = 0;
};

struct Mat3 {
  double m[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  Vec3 mul(const Vec3 &v) const {
    return {m[0] * v.x + m[1] * v.y + m[2] * v.z,
            m[3] * v.x + m[4] * v.y + m[5] * v.z,
            m[6] * v.x + m[7] * v.y + m[8] * v.z};
  }
  Mat3 mul(const Mat3 &o) const {
    Mat3 r;
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += m[i * 3 + k] * o.m[k * 3 + j];
        r.m[i * 3 + j] = s;
      }
    return r;
  }
};

Mat3 rpy_matrix(double r, double p, double y) {
  const double cr = std::cos(r), sr = std::sin(r);
  const double cp = std::cos(p), sp = std::sin(p);
  const double cy = std::cos(y), sy = std::sin(y);
  Mat3 Rx, Ry, Rz;
  Rx = {{1, 0, 0, 0, cr, -sr, 0, sr, cr}};
  Ry = {{cp, 0, sp, 0, 1, 0, -sp, 0, cp}};
  Rz = {{cy, -sy, 0, sy, cy, 0, 0, 0, 1}};
  return Rz.mul(Ry).mul(Rx);
}

// --- minimal XML scanner (tags + attributes; enough for URDF) -------------

struct XmlNode {
  std::string tag;
  std::map<std::string, std::string> attrs;
  std::vector<XmlNode> children;
};

struct XmlParser {
  const std::string &s;
  size_t i = 0;
  explicit XmlParser(const std::string &src) : s(src) {}

  void skip_ws() {
    while (i < s.size() && std::isspace((unsigned char)s[i])) ++i;
  }

  bool parse_doc(XmlNode *root) {
    while (i < s.size()) {
      skip_ws();
      if (i + 1 < s.size() && s[i] == '<') {
        if (s[i + 1] == '?' || s[i + 1] == '!') {  // prolog/comment
          i = s.find('>', i);
          if (i == std::string::npos) return false;
          ++i;
          continue;
        }
        return parse_element(root);
      } else {
        ++i;
      }
    }
    return false;
  }

  bool parse_element(XmlNode *out) {
    if (s[i] != '<') return false;
    ++i;
    out->tag.clear();
    while (i < s.size() && !std::isspace((unsigned char)s[i]) &&
           s[i] != '>' && s[i] != '/')
      out->tag += s[i++];
    // attributes
    for (;;) {
      skip_ws();
      if (i >= s.size()) return false;
      if (s[i] == '/') {  // self-closing
        i = s.find('>', i);
        if (i == std::string::npos) return false;
        ++i;
        return true;
      }
      if (s[i] == '>') {
        ++i;
        break;
      }
      std::string name;
      while (i < s.size() && s[i] != '=' && !std::isspace((unsigned char)s[i]))
        name += s[i++];
      skip_ws();
      if (i < s.size() && s[i] == '=') {
        ++i;
        skip_ws();
        char quote = s[i++];
        std::string val;
        while (i < s.size() && s[i] != quote) val += s[i++];
        ++i;
        out->attrs[name] = val;
      }
    }
    // children / close tag
    for (;;) {
      size_t lt = s.find('<', i);
      if (lt == std::string::npos) return false;
      i = lt;
      if (s.compare(i, 2, "</") == 0) {
        i = s.find('>', i);
        if (i == std::string::npos) return false;
        ++i;
        return true;
      }
      if (s.compare(i, 4, "<!--") == 0) {
        i = s.find("-->", i);
        if (i == std::string::npos) return false;
        i += 3;
        continue;
      }
      XmlNode child;
      if (!parse_element(&child)) return false;
      out->children.push_back(std::move(child));
    }
  }
};

std::vector<double> parse_floats(const std::string &str) {
  std::vector<double> out;
  std::istringstream is(str);
  double v;
  while (is >> v) out.push_back(v);
  return out;
}

const XmlNode *find_child(const XmlNode &n, const std::string &tag) {
  for (const auto &c : n.children)
    if (c.tag == tag) return &c;
  return nullptr;
}

void parse_origin(const XmlNode *el, Vec3 *xyz, Mat3 *R) {
  *xyz = {0, 0, 0};
  *R = Mat3();
  if (!el) return;
  auto it = el->attrs.find("xyz");
  if (it != el->attrs.end()) {
    auto v = parse_floats(it->second);
    if (v.size() == 3) *xyz = {v[0], v[1], v[2]};
  }
  it = el->attrs.find("rpy");
  if (it != el->attrs.end()) {
    auto v = parse_floats(it->second);
    if (v.size() == 3) *R = rpy_matrix(v[0], v[1], v[2]);
  }
}

bool load_obj_vertices(const std::string &path, std::vector<Vec3> *verts) {
  std::ifstream f(path);
  if (!f) return false;
  std::string line;
  while (std::getline(f, line)) {
    if (line.rfind("v ", 0) == 0) {
      auto v = parse_floats(line.substr(2));
      if (v.size() >= 3) verts->push_back({v[0], v[1], v[2]});
    }
  }
  return true;
}

std::string dirname_of(const std::string &p) {
  size_t k = p.find_last_of('/');
  return k == std::string::npos ? std::string(".") : p.substr(0, k);
}

struct Box {
  double c[3];
  double h[3];
};

void aabb_from_points(const std::vector<Vec3> &pts, const Vec3 &base,
                      Box *out) {
  double lo[3] = {1e30, 1e30, 1e30}, hi[3] = {-1e30, -1e30, -1e30};
  for (const auto &p : pts) {
    const double v[3] = {p.x, p.y, p.z};
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], v[k]);
      hi[k] = std::max(hi[k], v[k]);
    }
  }
  const double b[3] = {base.x, base.y, base.z};
  for (int k = 0; k < 3; ++k) {
    out->c[k] = (lo[k] + hi[k]) / 2 + b[k];
    out->h[k] = (hi[k] - lo[k]) / 2;
  }
}

}  // namespace

extern "C" {

// Parse one URDF file; append world AABBs (cx,cy,cz,hx,hy,hz per box) of all
// collision geometries, offset by base position.  global_scaling follows
// pybullet loadURDF semantics: it multiplies joint origins, collision
// origins, and geometry dimensions, but NOT the base position.  Returns a
// malloc'd double array (6 per box); *n_boxes receives the count.  Free with
// assetc_free.
double *assetc_compile_urdf_scaled(const char *urdf_path, double bx, double by,
                                   double bz, double global_scaling,
                                   int32_t *n_boxes) {
  const double gs = global_scaling;
  *n_boxes = 0;
  std::ifstream f(urdf_path);
  if (!f) return nullptr;
  std::stringstream ss;
  ss << f.rdbuf();
  const std::string src = ss.str();
  XmlParser parser(src);
  XmlNode robot;
  if (!parser.parse_doc(&robot) || robot.tag != "robot") return nullptr;

  // link placement from fixed-joint chain (URDF semantics)
  std::map<std::string, std::pair<Vec3, Mat3>> pose;
  for (const auto &c : robot.children)
    if (c.tag == "link") pose[c.attrs.count("name") ? c.attrs.at("name") : ""] =
        {Vec3{}, Mat3{}};
  for (int pass = 0; pass < 4; ++pass) {
    for (const auto &j : robot.children) {
      if (j.tag != "joint") continue;
      const XmlNode *par = find_child(j, "parent");
      const XmlNode *chi = find_child(j, "child");
      if (!par || !chi) continue;
      Vec3 oxyz;
      Mat3 oR;
      parse_origin(find_child(j, "origin"), &oxyz, &oR);
      oxyz = {oxyz.x * gs, oxyz.y * gs, oxyz.z * gs};
      auto pit = pose.find(par->attrs.count("link") ? par->attrs.at("link") : "");
      Vec3 pp = pit != pose.end() ? pit->second.first : Vec3{};
      Mat3 pR = pit != pose.end() ? pit->second.second : Mat3{};
      Vec3 cp = {pp.x + pR.mul(oxyz).x, pp.y + pR.mul(oxyz).y,
                 pp.z + pR.mul(oxyz).z};
      pose[chi->attrs.at("link")] = {cp, pR.mul(oR)};
    }
  }

  const std::string urdf_dir = dirname_of(urdf_path);
  std::vector<Box> boxes;
  const Vec3 base = {bx, by, bz};
  for (const auto &link : robot.children) {
    if (link.tag != "link") continue;
    auto lp = pose[link.attrs.count("name") ? link.attrs.at("name") : ""];
    for (const auto &col : link.children) {
      if (col.tag != "collision") continue;
      Vec3 oxyz;
      Mat3 oR;
      parse_origin(find_child(col, "origin"), &oxyz, &oR);
      oxyz = {oxyz.x * gs, oxyz.y * gs, oxyz.z * gs};
      Vec3 gp = {lp.first.x + lp.second.mul(oxyz).x,
                 lp.first.y + lp.second.mul(oxyz).y,
                 lp.first.z + lp.second.mul(oxyz).z};
      Mat3 gR = lp.second.mul(oR);
      const XmlNode *geom = find_child(col, "geometry");
      if (!geom) continue;
      std::vector<Vec3> pts;
      if (const XmlNode *box = find_child(*geom, "box")) {
        auto size = parse_floats(box->attrs.at("size"));
        if (size.size() != 3) continue;
        for (int sx = -1; sx <= 1; sx += 2)
          for (int sy = -1; sy <= 1; sy += 2)
            for (int sz = -1; sz <= 1; sz += 2) {
              Vec3 corner = {gs * sx * size[0] / 2, gs * sy * size[1] / 2,
                             gs * sz * size[2] / 2};
              Vec3 w = gR.mul(corner);
              pts.push_back({gp.x + w.x, gp.y + w.y, gp.z + w.z});
            }
      } else if (const XmlNode *mesh = find_child(*geom, "mesh")) {
        std::string fn = mesh->attrs.at("filename");
        Vec3 scale = {1, 1, 1};
        if (mesh->attrs.count("scale")) {
          auto sc = parse_floats(mesh->attrs.at("scale"));
          if (sc.size() == 3) scale = {sc[0], sc[1], sc[2]};
        }
        std::vector<Vec3> verts;
        if (!load_obj_vertices(urdf_dir + "/" + fn, &verts)) continue;
        for (const auto &v : verts) {
          Vec3 sv = {v.x * scale.x * gs, v.y * scale.y * gs,
                     v.z * scale.z * gs};
          Vec3 w = gR.mul(sv);
          pts.push_back({gp.x + w.x, gp.y + w.y, gp.z + w.z});
        }
      } else if (const XmlNode *cyl = find_child(*geom, "cylinder")) {
        const double r = std::atof(cyl->attrs.at("radius").c_str());
        const double l = std::atof(cyl->attrs.at("length").c_str());
        for (int sx = -1; sx <= 1; sx += 2)
          for (int sy = -1; sy <= 1; sy += 2)
            for (int sz = -1; sz <= 1; sz += 2) {
              Vec3 corner = {gs * sx * r, gs * sy * r, gs * sz * l / 2};
              Vec3 w = gR.mul(corner);
              pts.push_back({gp.x + w.x, gp.y + w.y, gp.z + w.z});
            }
      }
      if (pts.empty()) continue;
      Box b;
      aabb_from_points(pts, base, &b);
      boxes.push_back(b);
    }
  }

  if (boxes.empty()) return nullptr;
  double *out = static_cast<double *>(std::malloc(boxes.size() * 6 * sizeof(double)));
  for (size_t k = 0; k < boxes.size(); ++k) {
    for (int j = 0; j < 3; ++j) out[k * 6 + j] = boxes[k].c[j];
    for (int j = 0; j < 3; ++j) out[k * 6 + 3 + j] = boxes[k].h[j];
  }
  *n_boxes = static_cast<int32_t>(boxes.size());
  return out;
}

double *assetc_compile_urdf(const char *urdf_path, double bx, double by,
                            double bz, int32_t *n_boxes) {
  return assetc_compile_urdf_scaled(urdf_path, bx, by, bz, 1.0, n_boxes);
}

void assetc_free(double *p) { std::free(p); }

}  // extern "C"

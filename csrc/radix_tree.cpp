// Native radix-tree prefix cache.
//
// C++ implementation of the scheduler's hottest host-side structure
// (mem/radix_cache.py — the analog of the reference's radix tree, which in
// the reference fork is page-granular python; at multi-thousand-request
// scale the per-step match/insert/evict walks dominate scheduler CPU, so
// this is the framework's native-runtime component, exposed through the
// CPython C API (no pybind11 in the image)).
//
// Semantics mirror mem/radix_cache.py exactly; tests run the same suite
// against both implementations.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <map>
#include <memory>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

using TokenVec = std::vector<int64_t>;

struct Node {
  std::map<TokenVec, Node*> children;  // keyed by first page chunk
  Node* parent = nullptr;
  TokenVec key;                 // token ids, multiple of page_size
  std::vector<int64_t> value;   // page ids
  int64_t lock_ref = 0;
  uint64_t last_access = 0;
  uint64_t hit_count = 0;
  uint64_t id = 0;
};

struct Tree {
  int64_t page_size = 1;
  bool lfu = false;
  Node* root = nullptr;
  uint64_t clock = 0;
  uint64_t next_id = 0;
  int64_t evictable_pages = 0;
  int64_t protected_pages = 0;
  std::unordered_map<uint64_t, Node*> nodes;

  Node* new_node() {
    Node* n = new Node();
    n->id = next_id++;
    nodes[n->id] = n;
    return n;
  }

  void free_subtree(Node* n) {
    for (auto& kv : n->children) free_subtree(kv.second);
    nodes.erase(n->id);
    delete n;
  }

  void reset() {
    if (root) free_subtree(root);
    root = new_node();
    root->lock_ref = 1;
    evictable_pages = 0;
    protected_pages = 0;
  }

  ~Tree() {
    if (root) free_subtree(root);
  }

  TokenVec chunk_at(const TokenVec& ids, size_t page) const {
    size_t lo = page * page_size;
    size_t hi = std::min(lo + (size_t)page_size, ids.size());
    return TokenVec(ids.begin() + lo, ids.begin() + hi);
  }

  Node* split(Node* node, size_t n_pages) {
    Node* upper = new_node();
    upper->key.assign(node->key.begin(),
                      node->key.begin() + n_pages * page_size);
    upper->value.assign(node->value.begin(), node->value.begin() + n_pages);
    upper->parent = node->parent;
    upper->lock_ref = node->lock_ref;
    upper->last_access = node->last_access;
    upper->hit_count = node->hit_count;
    upper->parent->children[chunk_at(upper->key, 0)] = upper;

    node->key.erase(node->key.begin(), node->key.begin() + n_pages * page_size);
    node->value.erase(node->value.begin(), node->value.begin() + n_pages);
    node->parent = upper;
    upper->children[chunk_at(node->key, 0)] = node;
    return upper;
  }

  // returns (prefix_pages, last_node)
  std::pair<std::vector<int64_t>, Node*> match(const TokenVec& ids) {
    size_t aligned_pages = ids.size() / page_size;
    std::vector<int64_t> pages;
    Node* node = root;
    size_t i = 0;
    while (i < aligned_pages) {
      auto it = node->children.find(chunk_at(ids, i));
      if (it == node->children.end()) break;
      Node* child = it->second;
      size_t child_pages = child->value.size();
      size_t n_match = 0;
      while (n_match < child_pages && i + n_match < aligned_pages) {
        bool eq = std::equal(
            child->key.begin() + n_match * page_size,
            child->key.begin() + (n_match + 1) * page_size,
            ids.begin() + (i + n_match) * page_size);
        if (!eq) break;
        n_match++;
      }
      if (n_match < child_pages) {
        if (n_match == 0) break;
        child = split(child, n_match);
      }
      pages.insert(pages.end(), child->value.begin(), child->value.end());
      node = child;
      node->last_access = ++clock;
      node->hit_count++;
      i += n_match;
    }
    return {pages, node};
  }

  int64_t insert(const TokenVec& ids, const std::vector<int64_t>& page_ids) {
    size_t aligned_pages =
        std::min(ids.size() / page_size, page_ids.size());
    Node* node = root;
    size_t i = 0;
    int64_t dup_pages = 0;
    while (i < aligned_pages) {
      auto it = node->children.find(chunk_at(ids, i));
      if (it == node->children.end()) {
        Node* nn = new_node();
        nn->key.assign(ids.begin() + i * page_size,
                       ids.begin() + aligned_pages * page_size);
        nn->value.assign(page_ids.begin() + i, page_ids.end());
        nn->parent = node;
        node->children[chunk_at(nn->key, 0)] = nn;
        evictable_pages += (int64_t)nn->value.size();
        return dup_pages * page_size;
      }
      Node* child = it->second;
      size_t child_pages = child->value.size();
      size_t n_match = 0;
      while (n_match < child_pages && i + n_match < aligned_pages) {
        bool eq = std::equal(
            child->key.begin() + n_match * page_size,
            child->key.begin() + (n_match + 1) * page_size,
            ids.begin() + (i + n_match) * page_size);
        if (!eq) break;
        n_match++;
      }
      if (n_match == 0) {
        // diverging chunk with same first page key cannot happen (chunk is
        // the map key), so n_match >= 1 here; defensive break
        break;
      }
      if (n_match < child_pages) child = split(child, n_match);
      child->last_access = ++clock;
      dup_pages += (int64_t)n_match;
      node = child;
      i += n_match;
    }
    return dup_pages * page_size;
  }

  void lock(Node* node, int64_t delta) {
    while (node && node != root) {
      if (delta > 0 && node->lock_ref == 0) {
        evictable_pages -= (int64_t)node->value.size();
        protected_pages += (int64_t)node->value.size();
      }
      node->lock_ref += delta;
      if (delta < 0 && node->lock_ref == 0) {
        evictable_pages += (int64_t)node->value.size();
        protected_pages -= (int64_t)node->value.size();
      }
      node = node->parent;
    }
  }

  TokenVec path_tokens(Node* node) const {
    std::vector<const TokenVec*> parts;
    while (node && node != root) {
      parts.push_back(&node->key);
      node = node->parent;
    }
    TokenVec out;
    for (auto it = parts.rbegin(); it != parts.rend(); ++it)
      out.insert(out.end(), (*it)->begin(), (*it)->end());
    return out;
  }

  // evicts >= num_pages; appends (tokens, pages) per evicted leaf
  void evict(int64_t num_pages,
             std::vector<std::pair<TokenVec, std::vector<int64_t>>>* out) {
    using Entry = std::tuple<uint64_t, uint64_t, Node*>;
    auto cmp = [](const Entry& a, const Entry& b) { return a > b; };
    std::priority_queue<Entry, std::vector<Entry>, decltype(cmp)> heap(cmp);
    // collect unlocked leaves
    std::vector<Node*> stack{root};
    while (!stack.empty()) {
      Node* n = stack.back();
      stack.pop_back();
      if (n->children.empty()) {
        if (n != root && n->lock_ref == 0)
          heap.emplace(lfu ? n->hit_count : n->last_access, n->id, n);
      } else {
        for (auto& kv : n->children) stack.push_back(kv.second);
      }
    }
    int64_t freed = 0;
    while (!heap.empty() && freed < num_pages) {
      Node* leaf = std::get<2>(heap.top());
      heap.pop();
      out->emplace_back(path_tokens(leaf), leaf->value);
      freed += (int64_t)leaf->value.size();
      evictable_pages -= (int64_t)leaf->value.size();
      Node* parent = leaf->parent;
      parent->children.erase(chunk_at(leaf->key, 0));
      nodes.erase(leaf->id);
      delete leaf;
      if (parent != root && parent->children.empty() &&
          parent->lock_ref == 0) {
        heap.emplace(lfu ? parent->hit_count : parent->last_access,
                     parent->id, parent);
      }
    }
  }
};

// ---------------------------------------------------------------------------
// Python glue
// ---------------------------------------------------------------------------

void tree_capsule_destructor(PyObject* cap) {
  Tree* t = (Tree*)PyCapsule_GetPointer(cap, "sft_radix_tree");
  delete t;
}

TokenVec list_to_vec(PyObject* list) {
  TokenVec out;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(list);
  PyObject** items = PySequence_Fast_ITEMS(list);
  out.reserve(n);
  for (Py_ssize_t i = 0; i < n; i++)
    out.push_back(PyLong_AsLongLong(items[i]));
  return out;
}

PyObject* vec_to_list(const std::vector<int64_t>& v) {
  PyObject* list = PyList_New((Py_ssize_t)v.size());
  for (size_t i = 0; i < v.size(); i++)
    PyList_SET_ITEM(list, i, PyLong_FromLongLong(v[i]));
  return list;
}

Tree* get_tree(PyObject* cap) {
  return (Tree*)PyCapsule_GetPointer(cap, "sft_radix_tree");
}

PyObject* rt_new(PyObject*, PyObject* args) {
  long long page_size;
  int lfu;
  if (!PyArg_ParseTuple(args, "Lp", &page_size, &lfu)) return nullptr;
  Tree* t = new Tree();
  t->page_size = page_size;
  t->lfu = lfu != 0;
  t->reset();
  return PyCapsule_New(t, "sft_radix_tree", tree_capsule_destructor);
}

PyObject* rt_reset(PyObject*, PyObject* args) {
  PyObject* cap;
  if (!PyArg_ParseTuple(args, "O", &cap)) return nullptr;
  get_tree(cap)->reset();
  Py_RETURN_NONE;
}

PyObject* rt_match(PyObject*, PyObject* args) {
  PyObject *cap, *ids_obj;
  if (!PyArg_ParseTuple(args, "OO", &cap, &ids_obj)) return nullptr;
  PyObject* fast = PySequence_Fast(ids_obj, "ids must be a sequence");
  if (!fast) return nullptr;
  TokenVec ids = list_to_vec(fast);
  Py_DECREF(fast);
  Tree* t = get_tree(cap);
  auto [pages, node] = t->match(ids);
  return Py_BuildValue("(NK)", vec_to_list(pages),
                       (unsigned long long)node->id);
}

PyObject* rt_insert(PyObject*, PyObject* args) {
  PyObject *cap, *ids_obj, *pages_obj;
  if (!PyArg_ParseTuple(args, "OOO", &cap, &ids_obj, &pages_obj))
    return nullptr;
  PyObject* f1 = PySequence_Fast(ids_obj, "ids");
  PyObject* f2 = PySequence_Fast(pages_obj, "pages");
  if (!f1 || !f2) return nullptr;
  TokenVec ids = list_to_vec(f1);
  std::vector<int64_t> pages = list_to_vec(f2);
  Py_DECREF(f1);
  Py_DECREF(f2);
  int64_t dup = get_tree(cap)->insert(ids, pages);
  return PyLong_FromLongLong(dup);
}

PyObject* rt_lock(PyObject*, PyObject* args) {
  PyObject* cap;
  unsigned long long node_id;
  long long delta;
  if (!PyArg_ParseTuple(args, "OKL", &cap, &node_id, &delta)) return nullptr;
  Tree* t = get_tree(cap);
  auto it = t->nodes.find(node_id);
  if (it != t->nodes.end()) t->lock(it->second, delta);
  Py_RETURN_NONE;
}

PyObject* rt_evict(PyObject*, PyObject* args) {
  PyObject* cap;
  long long num_pages;
  if (!PyArg_ParseTuple(args, "OL", &cap, &num_pages)) return nullptr;
  std::vector<std::pair<TokenVec, std::vector<int64_t>>> out;
  get_tree(cap)->evict(num_pages, &out);
  PyObject* list = PyList_New((Py_ssize_t)out.size());
  for (size_t i = 0; i < out.size(); i++) {
    PyList_SET_ITEM(
        list, i,
        Py_BuildValue("(NN)", vec_to_list(out[i].first),
                      vec_to_list(out[i].second)));
  }
  return list;
}

PyObject* rt_sizes(PyObject*, PyObject* args) {
  PyObject* cap;
  if (!PyArg_ParseTuple(args, "O", &cap)) return nullptr;
  Tree* t = get_tree(cap);
  return Py_BuildValue("(LL)", (long long)t->evictable_pages,
                       (long long)t->protected_pages);
}

PyMethodDef methods[] = {
    {"rt_new", rt_new, METH_VARARGS, "create tree"},
    {"rt_reset", rt_reset, METH_VARARGS, "reset tree"},
    {"rt_match", rt_match, METH_VARARGS, "match prefix"},
    {"rt_insert", rt_insert, METH_VARARGS, "insert sequence"},
    {"rt_lock", rt_lock, METH_VARARGS, "adjust lock refs"},
    {"rt_evict", rt_evict, METH_VARARGS, "evict pages"},
    {"rt_sizes", rt_sizes, METH_VARARGS, "evictable/protected pages"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_radix_cpp",
    "native radix prefix cache", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__radix_cpp(void) { return PyModule_Create(&moduledef); }

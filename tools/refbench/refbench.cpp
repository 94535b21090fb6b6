// Benchmark driver for the UPSTREAM reference renderer (/root/reference).
//
// Purpose: measure the reference's OWN performance on scenes it published
// no numbers for (the spot-cow path-tracing scene, the Whitted demo), on
// THIS host, alongside its published Cornell config — so the repo's
// vs_baseline ratios can be scaled per scene from the one number the
// reference did publish (2.65 Mpaths/s, Cornell 1024^2@2048spp on an
// i7-12800HX):
//     baseline(scene) = 2.65 Mpaths/s * t_here(cornell) / t_here(scene)
// This file links the reference's sources unmodified (see CMakeLists);
// it is a measurement rig, not part of the framework.
//
// Usage: refbench cornell  <W> <spp> [frames]
//        refbench cow      <W> <spp> [frames]   (cornell + textured spot)
//        refbench whitted  <W> <spp> [frames]   (the main.cpp demo scene)

#include <chrono>
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>

#include <glm/glm.hpp>
#include <opencv2/opencv.hpp>
#include <render/PathTracing.hpp>
#include <render/RayTracing.hpp>
#include <scene/Scene.hpp>

using namespace SoftRasterizer;

#ifndef REF_HOME
#define REF_HOME "/root/reference/"
#endif

static std::shared_ptr<Scene> cornellScene(bool withCow) {
  auto scene = std::make_shared<Scene>(
      "Cornell", glm::vec3(0.0f, 0.0f, -0.9f), glm::vec3(0.0f),
      glm::vec3(0.0f, 1.0f, 0.0f), glm::vec3(0.f));

  auto red = std::make_shared<Material>();
  auto green = std::make_shared<Material>();
  auto white = std::make_shared<Material>();
  auto light = std::make_shared<Material>();
  red->type = green->type = white->type = light->type =
      MaterialType::DIFFUSE_AND_GLOSSY;
  red->Kd = glm::vec3(0.f, 0.f, 1.0f);
  green->Kd = glm::vec3(0.f, 1.0f, 0.f);
  white->Kd = glm::vec3(0.68f, 0.71f, 0.725f);
  light->Kd = glm::vec3(1.0f);
  light->emission = glm::vec3(31.0808f, 38.5664f, 47.8848f);

  const char *parts[8] = {"floor", "back", "top",   "left",
                          "right", "light", "small", "large"};
  const char *names[8] = {"floor", "back", "top",      "left",
                          "right", "light", "shortbox", "tallbox"};
  for (int i = 0; i < 8; ++i) {
    scene->addGraphicObj(
        std::string(REF_HOME "examples/models/cornellbox/cornellbox_parts/") +
            parts[i] + ".obj",
        names[i], glm::vec3(0, 1, 0), 0.f, glm::vec3(0.f), glm::vec3(1.f));
    scene->startLoadingMesh(names[i]);
  }
  if (auto o = scene->getMeshObj("light")) (*o)->setMaterial(light);
  if (auto o = scene->getMeshObj("left")) (*o)->setMaterial(red);
  if (auto o = scene->getMeshObj("right")) (*o)->setMaterial(green);
  for (const char *n : {"floor", "top", "back", "shortbox", "tallbox"})
    if (auto o = scene->getMeshObj(n)) (*o)->setMaterial(white);
  for (int i = 0; i < 8; ++i)
    scene->setModelMatrix(names[i], glm::vec3(0, 1, 0), 0.f, glm::vec3(0.f),
                          glm::vec3(0.25f));

  if (withCow) {
    auto cow = std::make_shared<Material>();
    cow->type = MaterialType::DIFFUSE_AND_GLOSSY;
    cow->Kd = glm::vec3(1.f);
    scene->addGraphicObj(REF_HOME
                         "examples/models/spot/spot_triangulated_good.obj",
                         "spot", glm::vec3(0.0f, 1.0f, 0.0f), 180.f,
                         glm::vec3(0.0f, -0.1f, 0.0f), glm::vec3(0.12f));
    scene->startLoadingMesh("spot");
    if (auto o = scene->getMeshObj("spot")) (*o)->setMaterial(cow);
    scene->addShader("spot_tex", REF_HOME "examples/models/spot/spot_texture.png",
                     SHADERS_TYPE::TEXTURE);
    scene->bindShader2Mesh("spot", "spot_tex");
    scene->setModelMatrix("spot", glm::vec3(0.0f, 1.0f, 0.0f), 180.f,
                          glm::vec3(0.0f, -0.1f, 0.0f), glm::vec3(0.12f));
  }
  return scene;
}

static std::shared_ptr<Scene> demoScene() {
  // the main.cpp Whitted demo (glass + diffuse spheres, textured spot +
  // crate), frame 0 transforms
  auto scene = std::make_shared<Scene>(
      "TestScene", glm::vec3(0.0f, 0.0f, -0.9f), glm::vec3(0.0f),
      glm::vec3(0.0f, 1.0f, 0.0f), glm::vec3(0.235294, 0.67451, 0.843137));
  auto crate = std::make_shared<Material>();
  auto spot = std::make_shared<Material>();
  auto diffuse = std::make_shared<Material>();
  auto light = std::make_shared<Material>();
  auto glass = std::make_shared<Material>();
  diffuse->type = crate->type = spot->type = MaterialType::DIFFUSE_AND_GLOSSY;
  diffuse->Ka = crate->Ka = spot->Ka = glm::vec3(0.005f);
  diffuse->Kd = crate->Kd = spot->Kd = glm::vec3(1.f);
  diffuse->Ks = crate->Ks = spot->Ks = glm::vec3(0.7937f);
  crate->specularExponent = 150.f;
  diffuse->specularExponent = spot->specularExponent = 150.f;
  light->type = MaterialType::DIFFUSE_AND_GLOSSY;
  light->Kd = glm::vec3(1.0f);
  light->emission = glm::vec3(1.f);
  glass->type = MaterialType::REFLECTION_AND_REFRACTION;
  glass->ior = 1.49f;

  scene->addGraphicObj(std::make_unique<Sphere>(glm::vec3(0.f), 1.0f),
                       "refrflect");
  scene->addGraphicObj(std::make_unique<Sphere>(glm::vec3(0.f), 1.0f),
                       "diffuse");
  scene->addGraphicObj(
      std::make_unique<SphereLight>(glm::vec3(0.f), glm::vec3(1.f), 5.f),
      "spherelight");
  scene->addGraphicObj(REF_HOME "examples/models/spot/spot_triangulated_good.obj",
                       "spot", glm::vec3(0, 1, 0), 0.f, glm::vec3(0.f),
                       glm::vec3(0.3f));
  scene->addGraphicObj(REF_HOME "examples/models/Crate/Crate1.obj", "Crate",
                       glm::vec3(0.f, 1.f, 0.f), 0.f, glm::vec3(0.0f),
                       glm::vec3(0.2f));
  scene->startLoadingMesh("spot");
  scene->startLoadingMesh("Crate");
  if (auto o = scene->getMeshObj("spot")) (*o)->setMaterial(spot);
  if (auto o = scene->getMeshObj("Crate")) (*o)->setMaterial(crate);
  if (auto o = scene->getMeshObj("refrflect")) (*o)->setMaterial(glass);
  if (auto o = scene->getMeshObj("diffuse")) (*o)->setMaterial(diffuse);
  if (auto o = scene->getMeshObj("spherelight")) (*o)->setMaterial(light);
  scene->addShader("spot_shader", REF_HOME "examples/models/spot/spot_texture.png",
                   SHADERS_TYPE::TEXTURE);
  scene->addShader("crate_shader", REF_HOME "examples/models/Crate/Crate1.png",
                   SHADERS_TYPE::TEXTURE);
  scene->bindShader2Mesh("spot", "spot_shader");
  scene->bindShader2Mesh("Crate", "crate_shader");

  float degree = 0.f;
  scene->setModelMatrix("spot", glm::vec3(0.f, 1.f, 0.f), degree,
                        glm::vec3(0.28f, 0.1f, 0.20f), glm::vec3(0.2f));
  scene->setModelMatrix("Crate", glm::vec3(0.f, 1.f, 0.f), degree,
                        glm::vec3(0.28f, -0.13f, 0.15f), glm::vec3(0.1f));
  scene->setModelMatrix("refrflect", glm::vec3(0.f, 1.f, 0.f), 0,
                        glm::vec3(0.f, 0.0f, 0.15f), glm::vec3(0.2f));
  scene->setModelMatrix("diffuse", glm::vec3(0.f, 1.f, 0.f), 0,
                        glm::vec3(-0.25f, -0.1f, 0.2f), glm::vec3(0.13f));
  scene->setModelMatrix("spherelight", glm::vec3(0.f, 1.f, 0.f), 0,
                        glm::vec3(0.f, 0.6f, 0.2f), glm::vec3(0.05f));
  return scene;
}

int main(int argc, char **argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s cornell|cow|whitted W spp [frames]\n",
                 argv[0]);
    return 2;
  }
  const std::string mode = argv[1];
  const int W = std::atoi(argv[2]);
  const int spp = std::atoi(argv[3]);
  const int frames = argc > 4 ? std::atoi(argv[4]) : 1;

  std::shared_ptr<RenderingPipeline> render;
  std::shared_ptr<Scene> scene;
  if (mode == "whitted") {
    render = std::make_shared<RayTracing>(W, W, spp);
    scene = demoScene();
  } else {
    render = std::make_shared<PathTracing>(W, W, spp);
    scene = cornellScene(mode == "cow");
  }
  render->addScene(scene);

  for (int f = 0; f < frames; ++f) {
    render->clear(Buffers::Color | Buffers::Depth);
    auto t0 = std::chrono::high_resolution_clock::now();
    try {
      render->display(Primitive::TRIANGLES);  // draw + merge (+imshow,
                                              // which throws headless and
                                              // is caught AFTER draw)
    } catch (const cv::Exception &) {
    }
    auto t1 = std::chrono::high_resolution_clock::now();
    double s = std::chrono::duration<double>(t1 - t0).count();
    std::printf("{\"mode\": \"%s\", \"frame\": %d, \"W\": %d, \"spp\": %d, "
                "\"seconds\": %.4f, \"mpaths_per_s\": %.4f}\n",
                mode.c_str(), f, W, spp, s,
                double(W) * W * spp / s / 1e6);
    std::fflush(stdout);
  }
  return 0;
}
